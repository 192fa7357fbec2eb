"""Griffin-Lim phase recovery as a lax.scan loop.

Replaces torchaudio.transforms.GriffinLim (reference NeRAF_model.py:139, used
with power=1 i.e. magnitude input). Matches torchaudio's algorithm: momentum
0.99 (applied as momentum/(1+momentum)), 32 iterations, random phase init.
torchaudio seeds from the global torch RNG; here the caller passes an explicit
JAX PRNG key for determinism.

The whole loop — istft, stft, phase projection — runs fused under jit on
device, so synthesizing a batch of RIR waveforms from predicted magnitudes is
one XLA computation with no host round trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from neraf_tpu.dsp.stft import istft, stft_complex


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "win_length", "n_iter", "length", "momentum", "rand_init"),
)
def griffin_lim(
    magnitude: jnp.ndarray,
    *,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    n_iter: int = 32,
    momentum: float = 0.99,
    length: int | None = None,
    key: jax.Array | None = None,
    rand_init: bool = True,
) -> jnp.ndarray:
    """Recover a waveform from a magnitude spectrogram.

    Args:
        magnitude: (..., F, T) non-negative magnitudes, F = n_fft//2+1.
        length: output waveform length; default (T-1)*hop.
        key: PRNG key for the random phase init (required if rand_init).
    Returns:
        (..., length) real waveform.
    """
    if win_length is None:
        win_length = n_fft
    if length is None:
        length = hop_length * (magnitude.shape[-1] - 1)
    mom = momentum / (1.0 + momentum)

    if rand_init:
        if key is None:
            key = jax.random.PRNGKey(0)
        ang = jax.random.uniform(key, magnitude.shape, dtype=jnp.float32) * (2 * jnp.pi)
        angles = jnp.exp(1j * ang.astype(jnp.complex64))
    else:
        angles = jnp.ones(magnitude.shape, dtype=jnp.complex64)

    mag = magnitude.astype(jnp.float32)

    def project(angles):
        """One GL projection: spec -> waveform -> spec."""
        inverse = istft(mag * angles, n_fft=n_fft, hop_length=hop_length,
                        win_length=win_length, length=length)
        return stft_complex(inverse, n_fft=n_fft, hop_length=hop_length, win_length=win_length)

    def body(carry, _):
        angles, tprev = carry
        rebuilt = project(angles)
        new = rebuilt - mom * tprev
        new = new / jnp.maximum(jnp.abs(new), 1e-16)
        return (new, rebuilt), None

    init_tprev = jnp.zeros_like(angles)
    (angles, _), _ = jax.lax.scan(body, (angles, init_tprev), None, length=n_iter)

    return istft(mag * angles, n_fft=n_fft, hop_length=hop_length,
                 win_length=win_length, length=length)
