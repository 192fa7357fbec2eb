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


def test_crash_repro_semantics_in_interpret_mode():
    """The minimized crasher is semantically valid (interpret-verified)."""
    from jax.experimental import pallas as pl

    from neraf_tpu.ops.pallas import gl_crash_repro as R

    x = jax.random.normal(jax.random.PRNGKey(0), (R.M, R.ROWS, R.HOP))
    out = pl.pallas_call(
        R._crash_kernel,
        out_shape=jax.ShapeDtypeStruct((R.M, R.T, 2 * R.HOP), jnp.float32),
        interpret=True,
    )(x)
    ref = jnp.concatenate([x[:, 0:R.T, :], x[:, 1:1 + R.T, :]], axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_mosaic_canaries_on_tpu():
    """Pin the backend state on real-TPU runs (skipped elsewhere):
    1. the fused GL kernel must COMPILE for both dataset geometries — it is
       the production 'auto' dispatch target (dsp/griffin_lim.py);
    2. the minimized shifted-value-concat still CRASHES — if this flips,
       the scratch-staging workaround in griffin_lim_kernel.py can be
       simplified back to the direct concat (see gl_crash_repro.py)."""
    import pytest

    if jax.default_backend() != "tpu":
        pytest.skip("Mosaic compile canaries need a real TPU backend")

    from neraf_tpu.ops.pallas.gl_crash_repro import (
        backend_crashes_on_shifted_value_concat,
    )
    from neraf_tpu.ops.pallas.griffin_lim_kernel import pallas_gl_available

    assert pallas_gl_available(512, 128, 512, 257, 78), \
        "fused GL kernel no longer compiles (SoundSpaces geometry)"
    assert pallas_gl_available(1024, 256, 512, 513, 60), \
        "fused GL kernel no longer compiles (RAF geometry)"
    if not backend_crashes_on_shifted_value_concat():
        pytest.fail(
            "Mosaic now accepts the shifted-value-slice concat! Simplify "
            "griffin_lim_kernel.reframe back to the direct concat "
            "(drop pad_scr) and delete gl_crash_repro.py.")


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
