"""Native (C++) host-side ingest: WAV decode, resample, STFT magnitudes.

The reference's file->tensor path runs on native code (torchaudio C++
Spectrogram/wav IO behind 16 torch DataLoader worker processes,
NeRAF_datamanager.py:84-104, NeRAF_dataset.py:67,113). This package is the
framework's native equivalent: `ingest.cpp` compiled on demand with g++ to a
cached shared library and bound via ctypes (no pybind11 here). Device
compute stays XLA/Pallas — this covers host-side ingest only.

All entry points degrade gracefully: `available()` is False when no
compiler/library is usable (or NERAF_NATIVE=0), and callers fall back to the
Python/JAX path. Parity with those paths is pinned by
tests/test_native_ingest.py.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "ingest.cpp"
_LIB = None
_TRIED = False


def _build_lib() -> Path | None:
    """Compile ingest.cpp into a content-addressed cached .so."""
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    cache = Path(os.environ.get("NERAF_NATIVE_CACHE",
                                Path.home() / ".cache" / "neraf_native"))
    cache.mkdir(parents=True, exist_ok=True)
    so = cache / f"libneraf_ingest_{tag}.so"
    if so.exists():
        return so
    # per-process tmp name: two concurrent builders must not interleave
    # output into the same file before the atomic rename
    tmp = so.with_suffix(f".so.tmp.{os.getpid()}")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           str(_SRC), "-o", str(tmp)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        os.replace(tmp, so)
    except (OSError, subprocess.SubprocessError):
        tmp.unlink(missing_ok=True)
        return None
    return so


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("NERAF_NATIVE", "1") == "0":
        return None
    so = _build_lib()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    c_float_p = ctypes.POINTER(ctypes.c_float)
    c_int_p = ctypes.POINTER(ctypes.c_int)
    lib.neraf_wav_info.argtypes = [ctypes.c_char_p, c_int_p, c_int_p, c_int_p]
    lib.neraf_wav_info.restype = ctypes.c_int
    lib.neraf_wav_read.argtypes = [ctypes.c_char_p, c_float_p, ctypes.c_int]
    lib.neraf_wav_read.restype = ctypes.c_int
    lib.neraf_resample_poly.argtypes = [
        c_float_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, c_float_p, ctypes.c_int]
    lib.neraf_resample_poly.restype = ctypes.c_int
    lib.neraf_stft_mag.argtypes = [
        c_float_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        c_float_p, ctypes.c_int]
    lib.neraf_stft_mag.restype = ctypes.c_int
    lib.neraf_process_rir_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        c_float_p, c_int_p]
    lib.neraf_process_rir_batch.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def wav_info(path) -> tuple[int, int, int]:
    """(sample_rate, frames, channels) of a wav without decoding samples."""
    lib = _load()
    assert lib is not None, "native ingest unavailable"
    sr = ctypes.c_int()
    frames = ctypes.c_int()
    ch = ctypes.c_int()
    rc = lib.neraf_wav_info(str(path).encode(), ctypes.byref(sr),
                            ctypes.byref(frames), ctypes.byref(ch))
    if rc != 0:
        raise IOError(f"native wav parse failed: {path}")
    return sr.value, frames.value, ch.value


def read_wav(path) -> tuple[int, np.ndarray]:
    """Native WAV read; returns (sr, (n,) or (n, C) float32) like utils.wav."""
    lib = _load()
    assert lib is not None, "native ingest unavailable"
    sr = ctypes.c_int()
    frames = ctypes.c_int()
    ch = ctypes.c_int()
    rc = lib.neraf_wav_info(str(path).encode(), ctypes.byref(sr),
                            ctypes.byref(frames), ctypes.byref(ch))
    if rc != 0:
        raise IOError(f"native wav parse failed: {path}")
    buf = np.empty((ch.value, frames.value), np.float32)
    rc = lib.neraf_wav_read(str(path).encode(), _fptr(buf), buf.size)
    if rc != 0:
        raise IOError(f"native wav read failed: {path}")
    data = buf.T if ch.value > 1 else buf[0]
    return sr.value, np.ascontiguousarray(data)


def resample_poly(x: np.ndarray, up: int, down: int, *, num_zeros: int = 24,
                  beta: float = 8.555) -> np.ndarray:
    """Native polyphase resample of the last axis; matches dsp.resample."""
    import math

    lib = _load()
    assert lib is not None, "native ingest unavailable"
    g = math.gcd(up, down)
    up, down = up // g, down // g
    x = np.ascontiguousarray(x, np.float32)
    lead = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    out_len = -(-x.shape[-1] * up // down)
    out = np.empty((flat.shape[0], out_len), np.float32)
    for i in range(flat.shape[0]):
        lib.neraf_resample_poly(_fptr(flat[i]), flat.shape[1], up, down,
                                num_zeros, beta, _fptr(out[i]), out_len)
    return out.reshape(lead + (out_len,))


def stft_magnitude(x: np.ndarray, *, n_fft: int, hop_length: int,
                   win_length: int | None = None) -> np.ndarray:
    """Native torch-convention STFT magnitudes; matches dsp.stft."""
    lib = _load()
    assert lib is not None, "native ingest unavailable"
    if win_length is None:
        win_length = n_fft
    x = np.ascontiguousarray(x, np.float32)
    lead = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    n_frames = 1 + x.shape[-1] // hop_length
    n_freq = n_fft // 2 + 1
    out = np.empty((flat.shape[0], n_freq, n_frames), np.float32)
    for i in range(flat.shape[0]):
        lib.neraf_stft_mag(_fptr(flat[i]), flat.shape[1], n_fft, hop_length,
                           win_length, _fptr(out[i]), n_frames)
    return out.reshape(lead + (n_freq, n_frames))


def process_rir_batch(paths, *, target_fs: int, n_fft: int, hop: int,
                      win: int, front_pad: int = 0, min_samples: int = 0,
                      max_samples: int = 0, max_channels: int = 2,
                      n_frames: int, n_threads: int | None = None,
                      clip: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """Batched wav -> (N, C, F, T) magnitude STFTs on a native thread pool.

    The DataLoader-worker replacement: clip, resample to target_fs,
    front-pad, zero-extend to min_samples, truncate to max_samples (0 = no
    cap), per-channel STFT. Returns (mags, channel_counts).
    """
    lib = _load()
    assert lib is not None, "native ingest unavailable"
    if n_threads is None:
        n_threads = min(8, os.cpu_count() or 1)
    n = len(paths)
    n_freq = n_fft // 2 + 1
    out = np.zeros((n, max_channels, n_freq, n_frames), np.float32)
    ch_out = np.zeros((n,), np.int32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    failed = lib.neraf_process_rir_batch(
        arr, n, target_fs, n_fft, hop, win, front_pad, min_samples,
        max_samples, max_channels, n_frames, n_threads, int(clip),
        _fptr(out), ch_out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    if failed:
        bad = [str(p) for p, c in zip(paths, ch_out) if c == 0]
        raise IOError(f"native ingest failed for {failed} file(s): {bad[:5]}")
    return out, ch_out
