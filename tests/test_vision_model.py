"""Vision (Nerfacto-class) model: forward shapes, gradients, mini-convergence."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from neraf_tpu.configs.config import VisionModelConfig
from neraf_tpu.models.vision import VisionModel
from neraf_tpu.models.camera_opt import apply_camera_opt, exp_map_so3, init_camera_opt


def _tiny_config():
    return VisionModelConfig(
        num_levels=4, features_per_level=2, log2_hashmap_size=12,
        base_res=4, max_res=64, hidden_dim=16, hidden_dim_color=16,
        geo_feat_dim=7, appearance_embed_dim=4,
        num_nerf_samples=16, num_proposal_samples=(32, 24))


def _rays(n=8, key=0):
    k = jax.random.PRNGKey(key)
    k1, k2 = jax.random.split(k)
    origins = jnp.zeros((n, 3)) + jnp.asarray([0.0, 0.0, 2.0])
    d = jax.random.normal(k1, (n, 3)) * 0.2 + jnp.asarray([0.0, 0.0, -1.0])
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return {"origins": origins, "directions": d,
            "camera_indices": jnp.zeros((n,), jnp.int32)}


def test_exp_map_so3():
    # 90 degrees about z
    om = jnp.asarray([[0.0, 0.0, np.pi / 2]])
    R = np.asarray(exp_map_so3(om))[0]
    np.testing.assert_allclose(R @ np.array([1, 0, 0]), [0, 1, 0], atol=1e-6)
    # zero rotation
    R0 = np.asarray(exp_map_so3(jnp.zeros((1, 3))))[0]
    np.testing.assert_allclose(R0, np.eye(3), atol=1e-7)


def test_camera_opt_apply():
    params = init_camera_opt(2).at[1, 3:].set(jnp.asarray([1.0, 0.0, 0.0]))
    o = jnp.zeros((2, 3))
    d = jnp.asarray([[0.0, 0, -1.0], [0, 0, -1.0]])
    idx = jnp.asarray([0, 1])
    no, nd = apply_camera_opt(params, idx, o, d)
    np.testing.assert_allclose(np.asarray(no[0]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(no[1]), [1, 0, 0], atol=1e-7)
    np.testing.assert_allclose(np.asarray(nd), np.asarray(d), atol=1e-6)


def test_vision_forward_shapes():
    model = VisionModel(config=_tiny_config(), num_cameras=3)
    params = model.init(jax.random.PRNGKey(0))
    rays = _rays()
    out = model.forward(params, rays, jax.random.PRNGKey(1), train=True)
    assert out["rgb"].shape == (8, 3)
    assert out["depth"].shape == (8,)
    assert out["accumulation"].shape == (8,)
    assert len(out["weights_list"]) == 3
    assert out["weights_list"][0].shape == (8, 32)
    assert out["weights_list"][1].shape == (8, 24)
    assert out["weights_list"][2].shape == (8, 16)
    rgb = np.asarray(out["rgb"])
    assert np.all(rgb >= 0) and np.all(rgb <= 1)


def test_vision_loss_and_grads():
    model = VisionModel(config=_tiny_config(), num_cameras=1)
    params = model.init(jax.random.PRNGKey(0))
    rays = _rays()
    gt = jax.random.uniform(jax.random.PRNGKey(3), (8, 3))

    def total(p):
        out = model.forward(p, rays, jax.random.PRNGKey(1), train=True)
        losses = model.loss(out, gt)
        return sum(losses.values()), losses

    (val, losses), grads = jax.value_and_grad(total, has_aux=True)(params)
    assert np.isfinite(float(val))
    assert set(losses) == {"rgb_loss", "interlevel_loss", "distortion_loss"}
    # gradients reach the field AND both proposal nets
    for group in ("fields", "proposal_networks"):
        s = sum(float(jnp.sum(jnp.abs(x)))
                for x in jax.tree_util.tree_leaves(grads[group]))
        assert s > 0, group


def _sphere_gt(origins, dirs, center=np.array([0.0, 0.0, 0.0]), radius=0.5):
    """Analytic render of a red sphere on gray background."""
    oc = np.asarray(origins) - center
    d = np.asarray(dirs)
    b = 2 * np.sum(oc * d, axis=-1)
    c = np.sum(oc * oc, axis=-1) - radius**2
    disc = b**2 - 4 * c
    hit = disc > 0
    rgb = np.full((d.shape[0], 3), 0.7, np.float32)
    rgb[hit] = [0.9, 0.1, 0.1]
    return jnp.asarray(rgb)


def test_vision_mini_convergence():
    """200 Adam steps on analytic sphere rays must cut the rgb loss sharply."""
    model = VisionModel(config=_tiny_config(), num_cameras=1, near=0.05, far=10.0)
    params = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(5e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        k1, k2, k3 = jax.random.split(key, 3)
        # random camera position on a radius-2 sphere looking inward
        origins = jnp.asarray([[0.0, 0.0, 2.0]]).repeat(64, 0)
        d = jax.random.normal(k1, (64, 3)) * jnp.asarray([0.3, 0.3, 0.0]) + jnp.asarray([0.0, 0.0, -1.0])
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        rays = {"origins": origins, "directions": d,
                "camera_indices": jnp.zeros((64,), jnp.int32)}
        gt = _sphere_gt_device(origins, d)

        def loss_fn(p):
            out = model.forward(p, rays, k2, train=True)
            return model.loss(out, gt)["rgb_loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state2, loss

    def _sphere_gt_device(origins, d, radius=0.5):
        oc = origins
        b = 2 * jnp.sum(oc * d, axis=-1)
        c = jnp.sum(oc * oc, axis=-1) - radius**2
        hit = (b**2 - 4 * c) > 0
        bg = jnp.full((d.shape[0], 3), 0.7)
        fg = jnp.broadcast_to(jnp.asarray([0.9, 0.1, 0.1]), (d.shape[0], 3))
        return jnp.where(hit[:, None], fg, bg)

    key = jax.random.PRNGKey(42)
    first = None
    for i in range(200):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if i == 0:
            first = float(loss)
    last = float(loss)
    assert last < first * 0.5, (first, last)


def test_vision_forward_hash_encoding():
    """The hash-grid backend stays available behind encoding='hash'."""
    from neraf_tpu.configs.config import VisionModelConfig

    cfg = VisionModelConfig(
        encoding="hash", num_levels=4, log2_hashmap_size=10, base_res=4,
        max_res=32, hidden_dim=16, hidden_dim_color=16, geo_feat_dim=7,
        appearance_embed_dim=4, num_nerf_samples=8, num_proposal_samples=(16, 12))
    model = VisionModel(config=cfg, num_cameras=1)
    params = model.init(jax.random.PRNGKey(0))
    out = model.forward(params, _rays(), jax.random.PRNGKey(1), train=True)
    assert out["rgb"].shape == (8, 3)
    assert np.all(np.isfinite(np.asarray(out["rgb"])))
