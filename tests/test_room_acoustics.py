"""Room-acoustics estimators: synthetic-RIR ground truth + host/device parity."""

import numpy as np

import jax.numpy as jnp

from neraf_tpu.metrics.room_acoustics import (
    batched_clarity,
    batched_edt,
    batched_rt60,
    compute_t60,
    evaluate_clarity,
    evaluate_edt,
    measure_clarity,
    measure_edt,
    measure_rt60,
)
from neraf_tpu.metrics.evaluators import RAFEvaluator, SoundSpacesEvaluator


def synth_rir(fs=22050, rt60=0.4, length=None, seed=0):
    """Exponentially-decaying noise with a known T60."""
    rng = np.random.default_rng(seed)
    if length is None:
        length = int(fs * rt60 * 2.5)
    t = np.arange(length) / fs
    tau = rt60 / (np.log(10 ** (60 / 20)))  # amplitude decay constant for 60 dB
    return (rng.standard_normal(length) * np.exp(-t / tau)).astype(np.float32)


def test_measure_rt60_synthetic():
    fs, rt60 = 22050, 0.4
    h = synth_rir(fs, rt60)
    est = measure_rt60(h, fs=fs, decay_db=30)
    assert abs(est - rt60) / rt60 < 0.1, est


def test_measure_rt60_invalid_raises():
    """A non-decaying signal never crosses the decay threshold -> exception."""
    h = np.ones(1000, dtype=np.float32)
    try:
        measure_rt60(h, fs=1000, decay_db=30)
        raised = False
    except (IndexError, ValueError):
        raised = True
    assert raised


def test_compute_t60_invalid_to_minus_one():
    good = synth_rir()[None]
    bad = np.ones((1, 1000), dtype=np.float32)
    gt, pred = compute_t60(bad, good, fs=22050)
    assert gt[0] == -1 and pred[0] == -1


def test_batched_rt60_matches_host():
    fs = 22050
    hs = np.stack([synth_rir(fs, rt, length=22050, seed=i) for i, rt in enumerate([0.3, 0.5, 0.7])])
    batched = np.asarray(batched_rt60(jnp.asarray(hs), fs, decay_db=30))
    for i in range(3):
        host = measure_rt60(hs[i], fs=fs, decay_db=30)
        np.testing.assert_allclose(batched[i], host, atol=2e-4)


def test_batched_rt60_invalid():
    h = jnp.ones((2, 1000))
    out = np.asarray(batched_rt60(h, 1000.0, decay_db=30))
    assert (out == -1).all()


def test_batched_edt_matches_host():
    fs = 22050
    hs = np.stack([synth_rir(fs, rt, length=22050, seed=i) for i, rt in enumerate([0.3, 0.6])])
    batched = np.asarray(batched_edt(jnp.asarray(hs), fs))
    for i in range(2):
        host = measure_edt(hs[i], fs=fs)
        np.testing.assert_allclose(batched[i], host, atol=2e-4)


def test_batched_clarity_matches_host():
    fs = 22050
    hs = np.stack([synth_rir(fs, 0.4, length=22050, seed=i) for i in range(2)])
    batched = np.asarray(batched_clarity(jnp.asarray(hs), fs))
    for i in range(2):
        host = measure_clarity(hs[i], fs=fs)
        np.testing.assert_allclose(batched[i], host, atol=1e-4)


def test_evaluators_full_metrics_run():
    """End-to-end metric dicts on synthetic binaural RIRs."""
    fs = 22050
    gt = np.stack([synth_rir(fs, 0.4, seed=1), synth_rir(fs, 0.4, seed=2)])
    pred = np.stack([synth_rir(fs, 0.45, seed=3), synth_rir(fs, 0.45, seed=4)])

    ev = SoundSpacesEvaluator(fs=fs)
    res = ev.get_full_metrics(None, None, gt, pred, pred, None, None)
    assert 0 <= res["audio_T60_mean_error"] < 100
    assert res["audio_total_invalids_T60"] == 0
    assert res["audio_EDT"] >= 0 and np.isfinite(res["audio_C50"])

    fs = 48000
    gt = synth_rir(fs, 0.3, seed=5)[None, : int(0.32 * fs)]
    pred = synth_rir(fs, 0.32, seed=6)[None, : int(0.32 * fs)]
    log_gt = np.log(np.abs(np.random.default_rng(0).standard_normal((1, 513, 60))).astype(np.float32) + 1e-3)
    ev = RAFEvaluator(fs=fs)
    res = ev.get_full_metrics(None, None, gt, pred, pred, None, log_gt)
    for key in ("audio_T60", "audio_stft_error", "audio_EDT", "audio_C50"):
        assert np.isfinite(res[key]), key


def test_quick_stft_metrics():
    rng = np.random.default_rng(0)
    a = np.abs(rng.standard_normal((2, 257, 60))).astype(np.float32)
    b = np.abs(rng.standard_normal((2, 257, 60))).astype(np.float32)
    r = RAFEvaluator(fs=48000).get_stft_metrics(a, b)
    expected = float(np.mean((a - b) ** 2) * 2)
    np.testing.assert_allclose(r["audio_mag"], expected, rtol=1e-5)
    assert "audio_spectral_loss" in r
    r2 = SoundSpacesEvaluator().get_stft_metrics(a, b)
    np.testing.assert_allclose(r2["audio_mag"], expected, rtol=1e-5)
