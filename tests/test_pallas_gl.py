"""Pallas fused Griffin-Lim: exact parity with the XLA matmul path.

Runs in Pallas interpret mode on CPU; the compiled kernel is exercised on
real TPU by bench.py.
"""

import numpy as np

import jax
import jax.numpy as jnp

from neraf_tpu.dsp.griffin_lim import _griffin_lim_matmul
from neraf_tpu.dsp.stft import stft_magnitude
from neraf_tpu.ops.pallas.griffin_lim_kernel import griffin_lim_pallas


def test_pallas_gl_matches_xla():
    n_fft, hop, win, T = 512, 128, 512, 20
    key = jax.random.PRNGKey(0)
    mag = jnp.abs(jax.random.normal(key, (3, 257, T)))  # (M, F, T)

    ang = jax.random.uniform(jax.random.PRNGKey(7), mag.shape) * (2 * np.pi)
    aR0, aI0 = jnp.cos(ang), jnp.sin(ang)
    length = hop * (T - 1)
    mom = 0.99 / 1.99

    ref = _griffin_lim_matmul(mag, aR0, aI0, n_fft, hop, win,
                              n_iter=4, mom=mom, length=length)
    out = griffin_lim_pallas(mag, n_fft=n_fft, hop_length=hop, win_length=win,
                             n_iter=4, length=length, block=4,
                             init_angles=(aR0, aI0), interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=1e-3)


def test_pallas_gl_reconstructs_tone():
    fs, n_fft, hop, win = 22050, 512, 128, 512
    t = np.arange(2048) / fs
    x = (np.sin(2 * np.pi * 600 * t) * np.exp(-t * 10)).astype(np.float32)
    mag = stft_magnitude(jnp.asarray(x), n_fft=n_fft, hop_length=hop,
                         win_length=win)[None]
    wav = griffin_lim_pallas(mag, n_fft=n_fft, hop_length=hop, win_length=win,
                             n_iter=16, block=1, key=jax.random.PRNGKey(0),
                             interpret=True)
    rec = stft_magnitude(wav, n_fft=n_fft, hop_length=hop, win_length=win)
    Tm = min(mag.shape[-1], rec.shape[-1])
    err = float(jnp.linalg.norm(rec[..., :Tm] - mag[..., :Tm]) / jnp.linalg.norm(mag))
    assert err < 0.2, err
