"""Auralization: predicted RIR x dry audio convolution.

Rebuild of the reference's viewer auralization flow (NeRAF_model.py:221-267,
WIP upstream — including an undefined-variable bug at :264 which is fixed
here) and the video notebook's overlap-add convolution (viz/video.ipynb).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from neraf_tpu.dsp.filters import fft_convolve
from neraf_tpu.dsp.griffin_lim import griffin_lim
from neraf_tpu.dsp.stft import log_to_magnitude


def rir_from_log_stft(log_stft: jnp.ndarray, *, n_fft: int, hop_len: int,
                      win_len: int, n_iter: int = 32,
                      key: jax.Array | None = None) -> np.ndarray:
    """(C, F, T) predicted log-magnitudes -> (C, L) RIR waveform in [-1, 1]."""
    mag = log_to_magnitude(jnp.asarray(log_stft))
    wav = griffin_lim(mag, n_fft=n_fft, hop_length=hop_len, win_length=win_len,
                      n_iter=n_iter, key=key)
    return np.clip(np.asarray(wav), -1.0, 1.0)


def auralize(input_wav: np.ndarray, rir: np.ndarray, fs: int,
             max_input_seconds: float = 5.0) -> np.ndarray:
    """Convolve dry audio with a (C, L) RIR -> (C, L_out) wet audio.

    Mirrors the reference's handle_btn: input truncated to 5 s, one FFT
    convolution per RIR channel, channels stacked.
    """
    input_wav = np.asarray(input_wav, dtype=np.float32)
    if input_wav.ndim == 2:  # stereo to mono
        input_wav = input_wav.mean(axis=-1)
    max_samples = int(max_input_seconds * fs)
    if input_wav.shape[0] > max_samples:
        input_wav = input_wav[:max_samples]

    outs = [np.asarray(fft_convolve(jnp.asarray(input_wav), jnp.asarray(rir[c])))
            for c in range(rir.shape[0])]
    return np.stack(outs).astype(np.float32)
