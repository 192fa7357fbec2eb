"""Polyphase resampling (librosa.resample / scipy.signal.resample_poly analogue).

Used by the data layer to convert 44.1 kHz SoundSpaces RIR wavs to 22.05 kHz
(reference NeRAF_dataset.py:331-338). Implemented as windowed-sinc
interpolation expressed as a strided convolution, so it runs on the MXU when
jitted and batches cleanly over channels.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _kaiser_sinc_kernel(up: int, down: int, num_zeros: int = 24, beta: float = 8.555) -> np.ndarray:
    """Lowpass windowed-sinc for rational resampling by up/down."""
    cutoff = 0.5 / max(up, down)
    half_len = num_zeros * max(up, down)
    n = np.arange(-half_len, half_len + 1)
    taps = 2 * cutoff * np.sinc(2 * cutoff * n)
    taps *= np.kaiser(len(n), beta)
    return (taps * up).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("up", "down"))
def resample_poly(x: jnp.ndarray, up: int, down: int) -> jnp.ndarray:
    """Resample the last axis of x by the rational factor up/down.

    Args:
        x: (..., L) signal.
    Returns:
        (..., ceil(L * up / down)) resampled signal.
    """
    g = math.gcd(up, down)
    up, down = up // g, down // g
    if up == 1 and down == 1:
        return x

    length = x.shape[-1]
    out_len = -(-length * up // down)  # ceil

    taps = jnp.asarray(_kaiser_sinc_kernel(up, down))
    half = (taps.shape[0] - 1) // 2

    lead = x.shape[:-1]
    xf = x.reshape((-1, 1, length)).astype(jnp.float32)

    # Upsample by zero-stuffing then convolve, implemented directly as a
    # conv with input dilation (XLA handles the zero-stuffing internally).
    kernel = taps[None, None, ::-1]
    y = jax.lax.conv_general_dilated(
        xf,
        kernel,
        window_strides=(1,),
        padding=[(half, half + up - 1)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    y = y[..., ::down][..., :out_len]
    return y.reshape(lead + (out_len,)).astype(x.dtype)
