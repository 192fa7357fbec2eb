"""Filters, Griffin-Lim, resampling: oracle tests vs scipy + self-consistency."""

import numpy as np
import scipy.signal

import jax
import jax.numpy as jnp

from neraf_tpu.dsp.filters import fft_convolve, highpass_biquad, hilbert_envelope
from neraf_tpu.dsp.griffin_lim import griffin_lim
from neraf_tpu.dsp.resample import resample_poly
from neraf_tpu.dsp.stft import stft_magnitude


def test_highpass_biquad_vs_scipy(rng):
    """Our biquad must match scipy.lfilter with RBJ highpass coefficients."""
    fs, fc, q = 48000.0, 200.0, 0.707
    x = rng.standard_normal(4000).astype(np.float32)

    w0 = 2 * np.pi * fc / fs
    alpha = np.sin(w0) / (2 * q)
    b = np.array([(1 + np.cos(w0)) / 2, -(1 + np.cos(w0)), (1 + np.cos(w0)) / 2])
    a = np.array([1 + alpha, -2 * np.cos(w0), 1 - alpha])
    ref = scipy.signal.lfilter(b / a[0], a / a[0], x)

    ours = np.asarray(highpass_biquad(jnp.asarray(x), fs, fc, q))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_fft_convolve_vs_scipy(rng):
    x = rng.standard_normal(500).astype(np.float32)
    h = rng.standard_normal(101).astype(np.float32)
    ref = scipy.signal.fftconvolve(x, h, mode="full")
    ours = np.asarray(fft_convolve(jnp.asarray(x), jnp.asarray(h)))
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_hilbert_envelope_vs_scipy(rng):
    x = rng.standard_normal(1024).astype(np.float32)
    ref = np.abs(scipy.signal.hilbert(x))
    ours = np.asarray(hilbert_envelope(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_resample_poly_tone():
    """A pure tone resampled 2:1 keeps its frequency and amplitude."""
    fs = 44100
    t = np.arange(fs // 5) / fs
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    y = np.asarray(resample_poly(jnp.asarray(x), 1, 2))
    assert y.shape[0] == -(-x.shape[0] // 2)
    t2 = np.arange(y.shape[0]) / (fs / 2)
    expected = np.sin(2 * np.pi * 440.0 * t2).astype(np.float32)
    # interior (edges have filter transients)
    np.testing.assert_allclose(y[500:-500], expected[500:-500], atol=5e-3)


def test_griffin_lim_reconstructs_tone():
    """GL phase recovery on a deterministic signal reaches low spectral error."""
    fs, n_fft, hop, win = 22050, 512, 128, 512
    t = np.arange(4096) / fs
    x = (np.sin(2 * np.pi * 500 * t) * np.exp(-t * 8)).astype(np.float32)
    mag = stft_magnitude(jnp.asarray(x), n_fft=n_fft, hop_length=hop, win_length=win)
    wav = griffin_lim(mag, n_fft=n_fft, hop_length=hop, win_length=win,
                      n_iter=32, key=jax.random.PRNGKey(0))
    mag_rec = stft_magnitude(wav, n_fft=n_fft, hop_length=hop, win_length=win)
    T = min(mag.shape[-1], mag_rec.shape[-1])
    err = np.linalg.norm(np.asarray(mag_rec)[..., :T] - np.asarray(mag)[..., :T]) / np.linalg.norm(np.asarray(mag))
    # A torch.stft/istft-based reference loop with identical hyperparameters
    # reaches 0.126 on this signal; ours reaches ~0.117. The plateau is
    # intrinsic to 32-iteration GL with random phase init.
    assert err < 0.13, f"spectral convergence {err}"


def test_griffin_lim_batched_shapes():
    mag = jnp.ones((2, 257, 60))
    wav = griffin_lim(mag, n_fft=512, hop_length=128, key=jax.random.PRNGKey(1))
    assert wav.shape == (2, 128 * 59)


def test_griffin_lim_matmul_matches_fft():
    """The matmul-DFT GL path is numerically identical to the fft path."""
    import jax

    fs, n_fft, hop, win = 22050, 512, 128, 512
    t = np.arange(2048) / fs
    x = (np.sin(2 * np.pi * 700 * t) * np.exp(-t * 10)).astype(np.float32)
    mag = stft_magnitude(jnp.asarray(x), n_fft=n_fft, hop_length=hop, win_length=win)
    kw = dict(n_fft=n_fft, hop_length=hop, win_length=win, n_iter=8,
              key=jax.random.PRNGKey(3))
    a = np.asarray(griffin_lim(mag, method="fft", **kw))
    b = np.asarray(griffin_lim(mag, method="matmul", **kw))
    np.testing.assert_allclose(a, b, atol=2e-4)
