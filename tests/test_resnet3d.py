"""ResNet3D: output shapes, batch-stats behavior."""

import numpy as np

import jax
import jax.numpy as jnp

from neraf_tpu.models.resnet3d import ResNet3D


def test_resnet50_shapes_small_grid():
    model = ResNet3D(backbone="resnet50", n_features=1024)
    x = jnp.zeros((1, 16, 16, 16, 7))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    out, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == (1, 1024)
    assert "batch_stats" in mut


def test_resnet18_runs_layer4_for_2048():
    # BasicBlock expansion is 1 -> layer4 yields 512 channels; the reference
    # probes the real output dim instead of trusting N_features, and so do we.
    model = ResNet3D(backbone="resnet18", n_features=2048)
    x = jnp.zeros((1, 32, 32, 32, 7))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, model.feature_dim)
    assert model.feature_dim == 512


def test_feature_dim_resnet50():
    assert ResNet3D(backbone="resnet50", n_features=1024).feature_dim == 1024
    assert ResNet3D(backbone="resnet50", n_features=2048).feature_dim == 2048


def test_s2d_stem_matches_direct_conv():
    """The space-to-depth stem (the joint step's hottest-op fix, profiled
    17.9 ms wgrad on v5e for the direct k5/s2 C_in=7 conv) must be
    numerically identical to the direct convolution — forward, dW and dx —
    and share the same (5,5,5,C,64) checkpoint parameter."""
    from neraf_tpu.models.resnet3d import _StemConv

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 16, 16, 16, 7))
    direct = _StemConv(impl="direct")
    s2d = _StemConv(impl="s2d")
    params = direct.init(key, x)
    assert params["params"]["kernel"].shape == (5, 5, 5, 7, 64)

    yd = direct.apply(params, x)
    ys = s2d.apply(params, x)
    assert yd.shape == ys.shape == (1, 8, 8, 8, 64)
    np.testing.assert_allclose(np.asarray(yd), np.asarray(ys),
                               atol=1e-5, rtol=1e-5)

    def loss(mod):
        return lambda p, xx: jnp.sum(jnp.sin(mod.apply(p, xx)))

    gd_p, gd_x = jax.grad(loss(direct), argnums=(0, 1))(params, x)
    gs_p, gs_x = jax.grad(loss(s2d), argnums=(0, 1))(params, x)
    kd = np.asarray(gd_p["params"]["kernel"])
    ks = np.asarray(gs_p["params"]["kernel"])
    scale = np.abs(kd).max()
    np.testing.assert_allclose(kd / scale, ks / scale, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gd_x), np.asarray(gs_x),
                               atol=1e-5, rtol=1e-5)


def test_s2d_stem_odd_size_falls_back():
    from neraf_tpu.models.resnet3d import _StemConv

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 15, 15, 15, 7))
    s2d = _StemConv(impl="s2d")
    params = s2d.init(key, x)
    assert s2d.apply(params, x).shape == (1, 8, 8, 8, 64)


def test_separable_maxpool_matches_direct():
    """Separable 3x1-D maxpool == joint 3^3 maxpool: identical forward
    always; identical gradients on tie-free (continuous random) input."""
    model_sep = ResNet3D(backbone="resnet18", pool_impl="separable")
    model_dir = ResNet3D(backbone="resnet18", pool_impl="direct")
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (1, 16, 16, 16, 7))
    variables = model_dir.init(jax.random.PRNGKey(0), x, train=True)

    ys = model_sep.apply(variables, x, train=False)
    yd = model_dir.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(yd),
                               atol=1e-5, rtol=1e-5)

    def loss(mod):
        return lambda xx: jnp.sum(mod.apply(variables, xx, train=False) ** 2)

    gs = np.asarray(jax.grad(loss(model_sep))(x))
    gd = np.asarray(jax.grad(loss(model_dir))(x))
    np.testing.assert_allclose(gs, gd, atol=1e-5, rtol=1e-4)


def test_batch_stats_update_in_train_mode():
    model = ResNet3D(backbone="resnet18", n_features=1024)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 16, 7))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    _, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mut["batch_stats"])
    changed = any(not np.allclose(np.asarray(a), np.asarray(b))
                  for a, b in zip(before, after))
    assert changed


def test_separable_maxpool_forward_equal_on_ties():
    """ADVICE r4: forward equality must hold even on DELIBERATELY tied
    window elements (quantized input => many exact ties); only gradient
    routing may differ between the separable and joint pools (both valid
    subgradients, documented in resnet3d.py)."""
    import flax.linen as fnn

    x = jnp.round(jax.random.normal(jax.random.PRNGKey(3),
                                    (1, 16, 16, 16, 4)) * 2.0) / 2.0
    sep = fnn.max_pool(x, (3, 1, 1), strides=(2, 1, 1),
                       padding=((1, 1), (0, 0), (0, 0)))
    sep = fnn.max_pool(sep, (1, 3, 1), strides=(1, 2, 1),
                       padding=((0, 0), (1, 1), (0, 0)))
    sep = fnn.max_pool(sep, (1, 1, 3), strides=(1, 1, 2),
                       padding=((0, 0), (0, 0), (1, 1)))
    direct = fnn.max_pool(x, (3, 3, 3), strides=(2, 2, 2),
                          padding=((1, 1),) * 3)
    np.testing.assert_array_equal(np.asarray(sep), np.asarray(direct))


def test_conv_impl_mm_wgrad_matches_direct():
    """The tap-matmul weight-gradient path (ops/conv3d.py, default) is
    numerically identical to XLA's native conv gradients through the whole
    backbone: same forward, same input grads, same param grads."""
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 16, 7))
    m_mm = ResNet3D(backbone="resnet18", conv_impl="mm_wgrad")
    m_dr = ResNet3D(backbone="resnet18", conv_impl="direct")
    variables = m_dr.init(jax.random.PRNGKey(0), x, train=True)

    y_mm = m_mm.apply(variables, x, train=False)
    y_dr = m_dr.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(y_mm), np.asarray(y_dr))

    def loss(mod):
        return lambda p, xx: jnp.sum(
            mod.apply({**variables, "params": p}, xx, train=False) ** 2)

    (gp_mm, gx_mm) = jax.grad(loss(m_mm), argnums=(0, 1))(
        variables["params"], x)
    (gp_dr, gx_dr) = jax.grad(loss(m_dr), argnums=(0, 1))(
        variables["params"], x)
    np.testing.assert_allclose(np.asarray(gx_mm), np.asarray(gx_dr),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gp_mm),
                    jax.tree_util.tree_leaves(gp_dr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
