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


@functools.lru_cache(maxsize=8)
def _dft_matrices_np(n_fft: int):
    F = n_fft // 2 + 1
    fw = np.fft.rfft(np.eye(n_fft), axis=1)  # (n_fft, F)
    eye_f = np.eye(F)
    return (fw.real.astype(np.float32), fw.imag.astype(np.float32),
            np.fft.irfft(eye_f, n=n_fft, axis=1).astype(np.float32),
            np.fft.irfft(1j * eye_f, n=n_fft, axis=1).astype(np.float32))


def _dft_matrices(n_fft: int):
    """Real DFT as matmul operands (built exactly from numpy FFTs of identity).

    Returns (Cr, Ci, Ar, Ai): rfft(x) = x@Cr + i x@Ci for (..., n_fft) rows,
    and irfft(R + iI) = R@Ar + I@Ai for (..., F) rows. On the target TPU the
    FFT custom-call blocks fusion and underperforms; n_fft<=1024 transforms
    are MXU-sized matmuls instead. Cached as numpy (jnp conversion happens
    per-trace so no tracers leak through the cache).
    """
    Cr, Ci, Ar, Ai = _dft_matrices_np(n_fft)
    return (jnp.asarray(Cr), jnp.asarray(Ci), jnp.asarray(Ar), jnp.asarray(Ai))


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
    if length is None:
        length = hop_length * (n_frames - 1)
    out = overlap_add(frames, n_fft, hop_length)
    wsq = window_sum_squares(n_fft, hop_length, win_length, n_frames, length)
    pad = n_fft // 2
    return out[..., pad : pad + length] / wsq


def overlap_add(frames: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """(..., T, n_fft) windowed frames -> (..., n_fft + hop*(T-1)) OLA signal.

    Scatter-free when hop divides n_fft: split each frame into q = n_fft/hop
    chunks of `hop` samples; chunk c of frame f lands at output row f+c, so
    summing q row-shifted paddings reconstructs the OLA with only
    reshapes/pads/adds (scatter-add is ~1000x slower on the target backend).
    """
    n_frames = frames.shape[-2]
    expected = n_fft + hop_length * (n_frames - 1)
    lead = frames.shape[:-2]

    if n_fft % hop_length == 0:
        q = n_fft // hop_length
        rows = n_frames + q - 1
        chunks = frames.reshape(*lead, n_frames, q, hop_length)
        out_r = jnp.zeros(lead + (rows, hop_length), dtype=frames.dtype)
        for c in range(q):
            pad_cfg = [(0, 0)] * len(lead) + [(c, q - 1 - c), (0, 0)]
            out_r = out_r + jnp.pad(chunks[..., c, :], pad_cfg)
        return out_r.reshape(*lead, rows * hop_length)[..., :expected]

    starts = np.arange(n_frames) * hop_length
    idx = jnp.asarray(starts[:, None] + np.arange(n_fft)[None, :])
    out = jnp.zeros(lead + (expected,), dtype=frames.dtype)
    return out.at[..., idx].add(frames)


@functools.lru_cache(maxsize=32)
def _wsq_np(n_fft: int, hop_length: int, win_length: int, n_frames: int,
            length: int) -> tuple:
    n = np.arange(win_length)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        w = np.pad(w, (left, n_fft - win_length - left))
    w2 = w.astype(np.float64) ** 2
    expected = n_fft + hop_length * (n_frames - 1)
    wsq = np.zeros(expected)
    for f in range(n_frames):
        wsq[f * hop_length : f * hop_length + n_fft] += w2
    pad = n_fft // 2
    return tuple(np.maximum(wsq[pad : pad + length], 1e-11).tolist())


def window_sum_squares(n_fft: int, hop_length: int, win_length: int,
                       n_frames: int, length: int) -> jnp.ndarray:
    """NOLA normalization vector (constant; built host-side in numpy)."""
    return jnp.asarray(_wsq_np(n_fft, hop_length, win_length, n_frames, length),
                       dtype=jnp.float32)
