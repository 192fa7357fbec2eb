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
