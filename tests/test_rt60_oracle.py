"""Independent oracle tests for the RT60/EDT estimators (VERDICT r1 item 5).

pyroomacoustics is not installed here, so the estimators are pinned against
oracles that do NOT share code with the implementation:

1. Closed-form goldens: for a geometric decay h[n] = r^n the Schroeder curve
   is analytically exact — energy[n] = r^{2n} (1 - r^{2(N-n)}) / (1 - r^2) —
   so the -5 dB headroom index, the decay index and the final RT60 value are
   derived here by direct analytic search, not by running the estimator.
2. Property tests from the published algorithm spec
   (pyroomacoustics.experimental.measure_rt60, BSD): invariance to prepended
   digital delay (the -5 dB headroom exists exactly for this), invariance to
   an appended all-zero tail (the spec truncates energy[:i_nz] — EXCLUSIVE of
   the last positive sample, a quirk the implementation must preserve), the
   60/decay_db extrapolation, and two-slope early-vs-late decay selection.
3. The device batched estimators must agree with the host path on all of it.

Reference call sites: NeRAF_helper.py:48-77 (plain decay_db=30 for
SoundSpaces, 200 Hz highpass + decay_db=10 "advance" for RAF).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from neraf_tpu.metrics.room_acoustics import (
    batched_edt,
    batched_rt60,
    batched_rt60_advance,
    measure_edt,
    measure_rt60,
    measure_rt60_advance,
)


def geometric_rir(r: float, n: int, rng=None) -> np.ndarray:
    """h[n] = r^n with alternating sign (broadband-ish), exact geometric decay."""
    h = r ** np.arange(n, dtype=np.float64)
    h *= np.where(np.arange(n) % 2 == 0, 1.0, -1.0)
    return h


def analytic_rt60_geometric(r: float, n: int, fs: float, decay_db: float) -> float:
    """Closed-form evaluation of the published algorithm on h[n] = ±r^n.

    Independent derivation: the Schroeder integral of r^{2k} is a geometric
    sum, evaluated in closed form; index searches run on that formula, never
    on the implementation's arrays.
    """
    # energy[n] = sum_{k=n}^{N-1} r^{2k}; spec truncates to [:i_nz] where
    # i_nz = last index with energy > 0 = N-1 (all positive) -> length N-1.
    length = n - 1

    def energy_db(i: int) -> float:
        num = (r ** (2 * i)) * (1 - r ** (2 * (n - i)))
        den = 1 - r ** (2 * n)
        return 10.0 * np.log10(num / den)

    def first_below(threshold: float) -> int:
        for i in range(length):
            if energy_db(i) < threshold:
                return i
        raise IndexError("no crossing")

    i_5db = first_below(-5.0)
    i_decay = first_below(-5.0 - decay_db)
    return (60.0 / decay_db) * (i_decay - i_5db) / fs


@pytest.mark.parametrize("r", [0.999, 0.9995, 0.998])
@pytest.mark.parametrize("decay_db", [10, 30, 60])
def test_rt60_matches_closed_form(r, decay_db):
    fs = 22050.0
    n = 60000
    h = geometric_rir(r, n)
    golden = analytic_rt60_geometric(r, n, fs, decay_db)
    est = measure_rt60(h, fs=fs, decay_db=decay_db)
    assert est == pytest.approx(golden, abs=1e-12), (
        f"r={r} decay_db={decay_db}: est {est} vs closed-form {golden}")
    # sanity: both agree with the continuous-limit formula T60 = -60/(20 log10 r)/fs
    cont = -60.0 / (20.0 * np.log10(r)) / fs
    assert est == pytest.approx(cont, rel=0.02)


def test_rt60_invariant_to_prepended_delay():
    """-5 dB headroom makes the estimate delay-invariant (spec rationale)."""
    fs = 22050.0
    h = geometric_rir(0.999, 40000)
    base = measure_rt60(h, fs=fs, decay_db=30)
    for delay in (1, 50, 500):
        delayed = np.concatenate([np.zeros(delay), h])
        assert measure_rt60(delayed, fs=fs, decay_db=30) == pytest.approx(
            base, abs=1e-9)


def test_rt60_invariant_to_zero_tail():
    """The spec truncates the all-zero tail (energy[:i_nz], exclusive)."""
    fs = 22050.0
    h = geometric_rir(0.999, 40000)
    base = measure_rt60(h, fs=fs, decay_db=30)
    tailed = np.concatenate([h, np.zeros(5000)])
    assert measure_rt60(tailed, fs=fs, decay_db=30) == pytest.approx(base, abs=1e-9)


def test_rt60_two_slope_selects_early_slope_at_small_decay_db():
    """decay_db=10 measures the early slope; decay_db=60 mixes in the late
    slope -> strictly larger estimate for early-fast/late-slow decays."""
    fs = 22050.0
    n1, n2 = 3000, 60000
    r_fast, r_slow = 0.998, 0.9997
    h = np.concatenate([
        geometric_rir(r_fast, n1),
        (r_fast ** n1) * geometric_rir(r_slow, n2),
    ])
    t10 = measure_rt60(h, fs=fs, decay_db=10)
    t60 = measure_rt60(h, fs=fs, decay_db=60)
    early_cont = -60.0 / (20.0 * np.log10(r_fast)) / fs
    assert t10 == pytest.approx(early_cont, rel=0.1)
    assert t60 > 1.5 * t10


def test_rt60_insufficient_decay_raises_invalid():
    """Signals that never reach -(5+decay_db) dB must raise (callers map the
    exception to the -1 'invalid' penalty, reference NeRAF_helper.py:53-62)."""
    fs = 22050.0
    h = geometric_rir(0.99999, 2000)  # barely decays within the window
    with pytest.raises((IndexError, ValueError)):
        measure_rt60(h, fs=fs, decay_db=60)
    with pytest.raises((IndexError, ValueError)):
        measure_rt60(np.zeros(1000), fs=fs, decay_db=30)


def test_rt60_advance_broadband_decay():
    """200 Hz highpass does not change a broadband exponential decay rate."""
    fs = 48000.0
    rng = np.random.default_rng(0)
    n = 48000
    tau = 0.08  # seconds
    env = np.exp(-np.arange(n) / (tau * fs))
    h = env * rng.normal(size=n)
    est = measure_rt60_advance(h, sr=fs)  # 200 Hz HP + decay_db=10
    # continuous-limit T60 for e^{-t/tau}: energy slope -20/(tau ln10) dB/s
    expected = 60.0 * tau * np.log(10) / 20.0
    assert est == pytest.approx(expected, rel=0.15)


def test_edt_matches_closed_form():
    """EDT: no -5 dB headroom, x6 scaling (reference NeRAF_helper.py:124-146)."""
    fs = 22050.0
    r, n = 0.999, 40000
    h = geometric_rir(r, n)

    # independent index search on the closed-form energy curve
    def energy_db(i):
        num = (r ** (2 * i)) * (1 - r ** (2 * (n - i)))
        den = 1 - r ** (2 * n)
        return 10.0 * np.log10(num / den)

    i_decay = next(i for i in range(n - 1) if energy_db(i) < -10.0)
    golden = 6.0 * i_decay / fs
    assert measure_edt(h, fs=fs) == pytest.approx(golden, abs=1e-12)
    # EDT is NOT delay-invariant (no headroom): prepending zeros adds time
    delayed = np.concatenate([np.zeros(441), h])
    assert measure_edt(delayed, fs=fs) == pytest.approx(
        golden + 6.0 * 441 / fs, abs=1e-9)


def test_batched_estimators_match_host_on_goldens():
    fs = 22050.0
    rs = [0.999, 0.9985, 0.9995]
    n = 40000
    hs = np.stack([geometric_rir(r, n) for r in rs])
    dev = np.asarray(batched_rt60(jnp.asarray(hs, jnp.float32), fs, decay_db=30))
    for k, r in enumerate(rs):
        host = measure_rt60(hs[k], fs=fs, decay_db=30)
        assert dev[k] == pytest.approx(host, rel=5e-3)

    dev_edt = np.asarray(batched_edt(jnp.asarray(hs, jnp.float32), fs))
    for k in range(len(rs)):
        assert dev_edt[k] == pytest.approx(measure_edt(hs[k], fs=fs), rel=5e-3)

    # invalid -> -1 on device where host raises
    flat = np.concatenate([np.zeros((1, n))])
    dev_bad = np.asarray(batched_rt60(jnp.asarray(flat, jnp.float32), fs, decay_db=30))
    assert dev_bad[0] == -1.0


def test_batched_advance_matches_host():
    fs = 48000.0
    rng = np.random.default_rng(1)
    n = 24000
    hs = np.stack([
        np.exp(-np.arange(n) / (0.05 * fs)) * rng.normal(size=n),
        np.exp(-np.arange(n) / (0.12 * fs)) * rng.normal(size=n),
    ])
    dev = np.asarray(batched_rt60_advance(jnp.asarray(hs, jnp.float32), fs))
    for k in range(2):
        host = measure_rt60_advance(hs[k], sr=fs)
        assert dev[k] == pytest.approx(host, rel=2e-2)
