"""DSP layer: spectrograms, phase recovery, filtering, resampling.

TPU-native replacements for the torchaudio/librosa/scipy DSP used by the
reference (NeRAF_dataset.py:67, NeRAF_model.py:139, NeRAF_helper.py:67-77):
everything is jnp.fft-based, static-shape, and jit-friendly.
"""

from neraf_tpu.dsp.stft import (
    stft_magnitude,
    stft_complex,
    istft,
    spectrogram_frames,
    log_magnitude,
    log_to_magnitude,
)
from neraf_tpu.dsp.griffin_lim import griffin_lim
from neraf_tpu.dsp.filters import (
    biquad,
    highpass_biquad,
    fft_convolve,
    hilbert_envelope,
)
from neraf_tpu.dsp.resample import resample_poly

__all__ = [
    "stft_magnitude",
    "stft_complex",
    "istft",
    "spectrogram_frames",
    "log_magnitude",
    "log_to_magnitude",
    "griffin_lim",
    "biquad",
    "highpass_biquad",
    "fft_convolve",
    "hilbert_envelope",
    "resample_poly",
]
