"""Filtering primitives: biquad IIR, FFT convolution, Hilbert envelope.

Replaces torchaudio.functional.highpass_biquad (reference NeRAF_helper.py:70),
scipy.signal.fftconvolve (NeRAF_model.py:260) and scipy.signal.hilbert
(NeRAF_helper.py:83). The IIR runs as a lax.scan over time (sequential by
nature); convolution and Hilbert are jnp.fft-based and fully parallel.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def _highpass_coeffs(sample_rate: float, cutoff_freq: float, q: float = 0.707):
    """Biquad highpass coefficients (RBJ audio-EQ cookbook, torchaudio-compatible)."""
    w0 = 2.0 * math.pi * cutoff_freq / sample_rate
    alpha = math.sin(w0) / (2.0 * q)
    cos_w0 = math.cos(w0)
    b0 = (1.0 + cos_w0) / 2.0
    b1 = -(1.0 + cos_w0)
    b2 = (1.0 + cos_w0) / 2.0
    a0 = 1.0 + alpha
    a1 = -2.0 * cos_w0
    a2 = 1.0 - alpha
    return (b0 / a0, b1 / a0, b2 / a0), (a1 / a0, a2 / a0)


@functools.partial(jax.jit, static_argnames=("coeffs_b", "coeffs_a"))
def _biquad_apply(x: jnp.ndarray, coeffs_b, coeffs_a) -> jnp.ndarray:
    b0, b1, b2 = coeffs_b
    a1, a2 = coeffs_a

    def step(carry, xt):
        x1, x2, y1, y2 = carry
        yt = b0 * xt + b1 * x1 + b2 * x2 - a1 * y1 - a2 * y2
        return (xt, x1, yt, y1), yt

    zeros = jnp.zeros(x.shape[:-1], dtype=x.dtype)
    init = (zeros, zeros, zeros, zeros)
    _, y = jax.lax.scan(step, init, jnp.moveaxis(x, -1, 0))
    return jnp.moveaxis(y, 0, -1)


def biquad(x: jnp.ndarray, b: tuple, a: tuple) -> jnp.ndarray:
    """Apply a normalized biquad (b0,b1,b2), (a1,a2) along the last axis."""
    return _biquad_apply(x, tuple(b), tuple(a))


def highpass_biquad(x: jnp.ndarray, sample_rate: float, cutoff_freq: float, q: float = 0.707) -> jnp.ndarray:
    """Highpass biquad matching torchaudio.functional.highpass_biquad."""
    cb, ca = _highpass_coeffs(sample_rate, cutoff_freq, q)
    return _biquad_apply(x, cb, ca)


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


@functools.partial(jax.jit, static_argnames=("mode",))
def fft_convolve(x: jnp.ndarray, y: jnp.ndarray, mode: str = "full") -> jnp.ndarray:
    """1-D FFT convolution along the last axis (scipy.signal.fftconvolve semantics).

    Supports broadcasting over leading axes. mode: 'full' | 'same'.
    """
    n = x.shape[-1] + y.shape[-1] - 1
    nfft = _next_pow2(n)
    X = jnp.fft.rfft(x, n=nfft)
    Y = jnp.fft.rfft(y, n=nfft)
    out = jnp.fft.irfft(X * Y, n=nfft)[..., :n]
    if mode == "same":
        start = (y.shape[-1] - 1) // 2
        out = out[..., start : start + x.shape[-1]]
    return out


@jax.jit
def hilbert_envelope(x: jnp.ndarray) -> jnp.ndarray:
    """|hilbert(x)| — analytic-signal envelope along the last axis."""
    n = x.shape[-1]
    X = jnp.fft.fft(x, axis=-1)
    h = jnp.zeros(n)
    if n % 2 == 0:
        h = h.at[0].set(1.0).at[n // 2].set(1.0).at[1 : n // 2].set(2.0)
    else:
        h = h.at[0].set(1.0).at[1 : (n + 1) // 2].set(2.0)
    return jnp.abs(jnp.fft.ifft(X * h, axis=-1))
