"""STFT/iSTFT parity against the torch.stft oracle (torchaudio conventions)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from neraf_tpu.dsp.stft import (
    istft,
    log_magnitude,
    log_to_magnitude,
    stft_complex,
    stft_magnitude,
)


def torch_spectrogram(x, n_fft, hop, win):
    """torchaudio.transforms.Spectrogram(power=None) equivalent via torch.stft."""
    window = torch.hann_window(win)
    return torch.stft(
        torch.as_tensor(x, dtype=torch.float32),
        n_fft=n_fft,
        hop_length=hop,
        win_length=win,
        window=window,
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )


@pytest.mark.parametrize(
    "n_fft,hop,win,length",
    [
        (1024, 256, 512, 15360),  # RAF geometry (0.32 s @ 48 kHz)
        (512, 128, 512, 9984),    # SoundSpaces geometry (78 frames @ 22.05 kHz)
        (256, 64, 128, 1000),     # odd length, win < n_fft
    ],
)
def test_stft_matches_torch(n_fft, hop, win, length, rng):
    x = rng.standard_normal(length).astype(np.float32)
    ours = np.asarray(stft_complex(jnp.asarray(x), n_fft=n_fft, hop_length=hop, win_length=win))
    ref = torch_spectrogram(x, n_fft, hop, win).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)


def test_stft_magnitude_batched(rng):
    x = rng.standard_normal((2, 3, 2048)).astype(np.float32)
    mags = np.asarray(stft_magnitude(jnp.asarray(x), n_fft=512, hop_length=128))
    for i in range(2):
        for j in range(3):
            ref = torch_spectrogram(x[i, j], 512, 128, 512).abs().numpy()
            np.testing.assert_allclose(mags[i, j], ref, atol=2e-3, rtol=1e-4)


def test_istft_roundtrip(rng):
    n_fft, hop, win = 512, 128, 512
    x = rng.standard_normal(4096).astype(np.float32)
    spec = stft_complex(jnp.asarray(x), n_fft=n_fft, hop_length=hop, win_length=win)
    recon = np.asarray(istft(spec, n_fft=n_fft, hop_length=hop, win_length=win, length=4096))
    np.testing.assert_allclose(recon, x, atol=1e-4)


def test_istft_matches_torch(rng):
    n_fft, hop, win = 512, 128, 512
    x = rng.standard_normal(4096).astype(np.float32)
    spec = torch_spectrogram(x, n_fft, hop, win)
    ref = torch.istft(spec, n_fft=n_fft, hop_length=hop, win_length=win,
                      window=torch.hann_window(win), center=True, length=4096).numpy()
    ours = np.asarray(istft(jnp.asarray(spec.numpy()), n_fft=n_fft, hop_length=hop,
                            win_length=win, length=4096))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_log_transforms_roundtrip(rng):
    mag = np.abs(rng.standard_normal((5, 7)).astype(np.float32))
    log = log_magnitude(jnp.asarray(mag))
    back = np.asarray(log_to_magnitude(log))
    np.testing.assert_allclose(back, mag, atol=1e-5)


def test_istft_non_divisible_hop(rng):
    """Gather/scatter fallback path when hop does not divide n_fft."""
    n_fft, hop, win = 512, 160, 512
    x = rng.standard_normal(3200).astype(np.float32)
    spec = stft_complex(jnp.asarray(x), n_fft=n_fft, hop_length=hop, win_length=win)
    recon = np.asarray(istft(spec, n_fft=n_fft, hop_length=hop, win_length=win,
                             length=3200))
    ref = torch.istft(torch_spectrogram(x, n_fft, hop, win), n_fft=n_fft,
                      hop_length=hop, win_length=win,
                      window=torch.hann_window(win), center=True, length=3200).numpy()
    np.testing.assert_allclose(recon, ref, atol=1e-4)


def test_raf_geometry_roundtrip(rng):
    """RAF STFT geometry (1024/256/512) framing + inversion."""
    x = rng.standard_normal(15360).astype(np.float32)
    spec = stft_complex(jnp.asarray(x), n_fft=1024, hop_length=256, win_length=512)
    assert spec.shape == (513, 61)
    recon = np.asarray(istft(spec, n_fft=1024, hop_length=256, win_length=512,
                             length=15360))
    np.testing.assert_allclose(recon, x, atol=1e-4)
