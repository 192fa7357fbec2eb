"""Volume rendering, samplers, contraction: analytic oracles."""

import numpy as np

import jax
import jax.numpy as jnp

from neraf_tpu.ops.contraction import contract_to_unit, scene_contraction
from neraf_tpu.ops.render import (
    distortion_loss,
    interlevel_loss,
    render_accumulation,
    render_depth,
    render_rgb,
    render_weights,
)
from neraf_tpu.ops.samplers import (
    bins_to_samples,
    pdf_spacing_bins,
    spacing_bins_to_euclidean,
    uniform_spacing_bins,
)


def test_scene_contraction():
    inside = jnp.asarray([[0.5, 0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(scene_contraction(inside)), [[0.5, 0, 0]])
    far = jnp.asarray([[100.0, 0.0, 0.0]])
    out = np.asarray(scene_contraction(far))
    np.testing.assert_allclose(out, [[2 - 1 / 100, 0, 0]], rtol=1e-5)
    # contraction is bounded by 2 and contract_to_unit by [0, 1]
    huge = jnp.asarray([[1e8, -1e8, 1e8]])
    u = np.asarray(contract_to_unit(huge))
    assert np.all(u >= 0) and np.all(u <= 1)


def test_render_weights_oracle():
    """Manual transmittance computation on a 3-sample ray."""
    dens = jnp.asarray([[1.0, 2.0, 0.5]])
    deltas = jnp.asarray([[0.1, 0.2, 0.3]])
    w = np.asarray(render_weights(dens, deltas))[0]
    dd = np.array([0.1, 0.4, 0.15])
    T = np.exp(-np.concatenate([[0.0], np.cumsum(dd)[:-1]]))
    expected = T * (1 - np.exp(-dd))
    np.testing.assert_allclose(w, expected, rtol=1e-5)


def test_render_rgb_background():
    rgb = jnp.asarray([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])
    w = jnp.asarray([[0.5, 0.0]])
    out = np.asarray(render_rgb(rgb, w, background_color="black"))[0]
    np.testing.assert_allclose(out, [0.5, 0, 0], atol=1e-6)
    out_white = np.asarray(render_rgb(rgb, w, background_color="white"))[0]
    np.testing.assert_allclose(out_white, [1.0, 0.5, 0.5], atol=1e-6)
    out_last = np.asarray(render_rgb(rgb, w, background_color="last_sample"))[0]
    np.testing.assert_allclose(out_last, [0.5, 0.5, 0], atol=1e-6)


def test_render_depth_and_acc():
    w = jnp.asarray([[0.1, 0.6, 0.2]])
    steps = jnp.asarray([[1.0, 2.0, 3.0]])
    np.testing.assert_allclose(float(render_accumulation(w)[0]), 0.9, rtol=1e-6)
    assert float(render_depth(w, steps)[0]) == 2.0  # cumweight crosses 0.5 at s=2
    exp_d = float(render_depth(w, steps, method="expected")[0])
    np.testing.assert_allclose(exp_d, (0.1 + 1.2 + 0.6) / 0.9, rtol=1e-4)


def test_uniform_bins_cover_and_sorted():
    key = jax.random.PRNGKey(0)
    bins = uniform_spacing_bins(key, 4, 16, single_jitter=True)
    assert bins.shape == (4, 17)
    b = np.asarray(bins)
    assert np.all(b[:, 0] == 0.0) and np.all(b[:, -1] == 1.0)
    assert np.all(np.diff(b, axis=-1) >= -1e-6)

    det = uniform_spacing_bins(key, 2, 8, deterministic=True)
    np.testing.assert_allclose(np.asarray(det)[0], np.linspace(0, 1, 9), atol=1e-6)


def test_spacing_to_euclidean_range():
    bins = jnp.linspace(0, 1, 11)[None]
    near = jnp.asarray([0.05])
    far = jnp.asarray([1000.0])
    t = np.asarray(spacing_bins_to_euclidean(bins, near, far))[0]
    np.testing.assert_allclose(t[0], 0.05, rtol=1e-4)
    np.testing.assert_allclose(t[-1], 1000.0, rtol=1e-3)
    assert np.all(np.diff(t) > 0)


def test_pdf_resampling_concentrates():
    """PDF sampling should place most new bins where the weights are."""
    key = jax.random.PRNGKey(0)
    bins = jnp.broadcast_to(jnp.linspace(0, 1, 65), (1, 65))
    w = np.zeros((1, 64), np.float32)
    w[:, 30:34] = 1.0  # all mass in [30/64, 34/64]
    new_bins = np.asarray(pdf_spacing_bins(key, bins, jnp.asarray(w), 32))
    frac_inside = np.mean((new_bins >= 29 / 64) & (new_bins <= 35 / 64))
    assert frac_inside > 0.9, frac_inside
    assert np.all(np.diff(new_bins, axis=-1) >= -1e-6)


def test_bins_to_samples_geometry():
    key = jax.random.PRNGKey(0)
    bins = uniform_spacing_bins(key, 2, 8, deterministic=True)
    origins = jnp.zeros((2, 3))
    dirs = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]])
    s = bins_to_samples(bins, origins, dirs, jnp.full((2,), 0.1), jnp.full((2,), 10.0))
    assert s["positions"].shape == (2, 8, 3)
    # positions lie along the ray at mid distances
    np.testing.assert_allclose(
        np.asarray(s["positions"][0, :, 0]), np.asarray(s["mids"][0]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s["positions"][0, :, 1]), 0.0, atol=1e-6)


def test_interlevel_loss_zero_when_covered():
    """If the proposal histogram fully covers the final weights, loss ~= 0."""
    bins = jnp.broadcast_to(jnp.linspace(0, 1, 17), (1, 17))
    ss, se = bins[..., :-1], bins[..., 1:]
    w = jnp.ones((1, 16)) / 16.0
    # proposal = same histogram -> outer sum >= w everywhere
    loss = float(interlevel_loss(w, ss, se, w, ss, se))
    assert loss < 1e-8

    # proposal with zero mass -> positive loss
    loss2 = float(interlevel_loss(w, ss, se, jnp.zeros_like(w), ss, se))
    assert loss2 > 1e-4


def test_distortion_loss_prefers_compact():
    bins = jnp.broadcast_to(jnp.linspace(0, 1, 17), (1, 17))
    ss, se = bins[..., :-1], bins[..., 1:]
    compact = np.zeros((1, 16), np.float32)
    compact[:, 8] = 1.0
    spread = np.ones((1, 16), np.float32) / 16.0
    l_compact = float(distortion_loss(jnp.asarray(compact), ss, se))
    l_spread = float(distortion_loss(jnp.asarray(spread), ss, se))
    assert l_compact < l_spread
