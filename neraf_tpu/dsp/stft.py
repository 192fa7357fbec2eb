"""STFT / iSTFT with torch-compatible conventions, as pure JAX.

The reference computes spectrograms with
``torchaudio.transforms.Spectrogram(n_fft, win_length, hop_length, power=None)``
(reference NeRAF_dataset.py:67, NeRAF_evaluator.py:129), i.e. torch.stft with
center=True, pad_mode='reflect', a Hann window of ``win_length`` zero-padded
symmetrically to ``n_fft``, onesided rfft, no normalization. This module
reproduces those conventions exactly (float tolerance) so STFT-derived metrics
match the reference bit-for-bit semantics.

All shapes are static: the number of frames is a pure function of the signal
length, so everything jits cleanly on TPU. Framing is implemented as a gather
with a precomputed (static) index matrix — XLA lowers this to an efficient
strided load — and the overlap-add inverse uses a static scatter-add.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (matches torch.hann_window(periodic=True))."""
    n = np.arange(win_length)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))
    return jnp.asarray(w, dtype=dtype)


def _padded_window(n_fft: int, win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Hann(win_length) zero-padded symmetrically to n_fft (torch.stft rule)."""
    w = hann_window(win_length, dtype)
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        w = jnp.pad(w, (left, n_fft - win_length - left))
    return w


def num_frames(length: int, hop_length: int) -> int:
    """Number of STFT frames for a centered transform of a length-L signal."""
    return 1 + length // hop_length


def _frame_indices(length_padded: int, n_fft: int, hop_length: int, n_frames: int) -> np.ndarray:
    starts = np.arange(n_frames) * hop_length
    return starts[:, None] + np.arange(n_fft)[None, :]


def spectrogram_frames(x: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """Center-pad (reflect) and slice a signal into overlapping frames.

    When hop divides n_fft (both dataset geometries: 512/128 and 1024/256),
    framing is pure reshapes: view the padded signal as rows of `hop` samples
    and concatenate q = n_fft/hop shifted row-slices. Zero gathers — on the
    target TPU backend gathers lower to sequential loops, so this path is the
    difference between microseconds and hundreds of ms inside Griffin-Lim.

    Args:
        x: (..., L) real signal.
    Returns:
        (..., n_frames, n_fft) frames, n_frames = 1 + L // hop.
    """
    length = x.shape[-1]
    n_frm = num_frames(length, hop_length)
    pad = n_fft // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")

    if n_fft % hop_length == 0:
        q = n_fft // hop_length
        rows = n_frm + q - 1
        need = rows * hop_length
        if xp.shape[-1] < need:
            xp = jnp.pad(xp, [(0, 0)] * (x.ndim - 1) + [(0, need - xp.shape[-1])])
        xr = xp[..., :need].reshape(*x.shape[:-1], rows, hop_length)
        strips = [xr[..., c : c + n_frm, :] for c in range(q)]
        return jnp.concatenate(strips, axis=-1)

    idx = jnp.asarray(_frame_indices(xp.shape[-1], n_fft, hop_length, n_frm))
    return xp[..., idx]


def stft_complex(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
) -> jnp.ndarray:
    """Complex STFT matching torch.stft(center=True, pad_mode='reflect').

    Args:
        x: (..., L) real signal.
    Returns:
        (..., n_fft//2+1, n_frames) complex spectrogram (freq-major, like torch).
    """
    if win_length is None:
        win_length = n_fft
    window = _padded_window(n_fft, win_length, x.dtype)
    frames = spectrogram_frames(x, n_fft, hop_length) * window
    spec = jnp.fft.rfft(frames, axis=-1)  # (..., n_frames, F)
    return jnp.swapaxes(spec, -1, -2)


def stft_magnitude(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
) -> jnp.ndarray:
    """Magnitude spectrogram = |stft|, the reference's Spectrogram(power=None)+abs."""
    return jnp.abs(stft_complex(x, n_fft, hop_length, win_length))


def log_magnitude(mag: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """log(|X| + 1e-3) — the reference's log transform (NeRAF_dataset.py:117)."""
    return jnp.log(mag + eps)


def log_to_magnitude(log_mag: jnp.ndarray, eps: float = 1e-3, max_val: float = 1e4) -> jnp.ndarray:
    """clip(exp(x) − 1e-3, 0, 1e4) — inverse log transform (NeRAF_model.py:574)."""
    return jnp.clip(jnp.exp(log_mag) - eps, 0.0, max_val)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "length"))
def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    length: int | None = None,
) -> jnp.ndarray:
    """Inverse STFT with overlap-add and NOLA window-sum normalization.

    Matches torch.istft(center=True): trims n_fft//2 from both ends and
    normalizes by the summed squared window.

    Args:
        spec: (..., F, n_frames) complex spectrogram (onesided).
        length: output length; default (n_frames-1)*hop.
    Returns:
        (..., length) real signal.
    """
    if win_length is None:
        win_length = n_fft
    window = _padded_window(n_fft, win_length, jnp.float32)

    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)  # (..., T, n_fft)
    frames = frames * window

    n_frames = frames.shape[-2]
    expected = n_fft + hop_length * (n_frames - 1)
    lead = spec.shape[:-2]

    if n_fft % hop_length == 0:
        # Scatter-free overlap-add: split each frame into q = n_fft/hop chunks
        # of `hop` samples; chunk c of frame f lands at output row f+c. Summing
        # q row-shifted paddings reconstructs the OLA exactly, with only
        # reshapes/pads/adds (the scatter-add path is ~1000x slower on this
        # TPU backend).
        q = n_fft // hop_length
        rows = n_frames + q - 1
        chunks = frames.reshape(*lead, n_frames, q, hop_length)
        out_r = jnp.zeros(lead + (rows, hop_length), dtype=frames.dtype)
        for c in range(q):
            pad_cfg = [(0, 0)] * len(lead) + [(c, q - 1 - c), (0, 0)]
            out_r = out_r + jnp.pad(chunks[..., c, :], pad_cfg)
        out = out_r.reshape(*lead, rows * hop_length)[..., :expected]
    else:
        starts = np.arange(n_frames) * hop_length
        idx = jnp.asarray(starts[:, None] + np.arange(n_fft)[None, :])
        out = jnp.zeros(lead + (expected,), dtype=frames.dtype)
        out = out.at[..., idx].add(frames)

    # window-sum normalization is a constant — compute host-side in numpy
    # (re-derive the padded window in numpy: `window` is traced under jit)
    n = np.arange(win_length)
    w_np = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        w_np = np.pad(w_np, (left, n_fft - win_length - left))
    w_np = w_np.astype(np.float64) ** 2
    wsq_np = np.zeros(expected)
    for f in range(n_frames):
        wsq_np[f * hop_length : f * hop_length + n_fft] += w_np

    pad = n_fft // 2
    if length is None:
        length = hop_length * (n_frames - 1)
    out = out[..., pad : pad + length]
    wsq = jnp.asarray(np.maximum(wsq_np[pad : pad + length], 1e-11), dtype=jnp.float32)
    return out / wsq
