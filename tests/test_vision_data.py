"""Vision data stack: transforms parsing, ray geometry, distortion inversion."""

import json

import numpy as np

import jax.numpy as jnp

from neraf_tpu.data.vision_data import (
    CameraSet,
    _undistort,
    camera_arrays,
    generate_rays,
    load_transforms,
)

from fixtures import make_vision_scene


def test_load_transforms_splits(tmp_path):
    scene = make_vision_scene(tmp_path, n_frames=6, size=16)
    train = load_transforms(scene, "train", eval_mode="fraction",
                            train_split_fraction=0.8)
    ev = load_transforms(scene, "eval", eval_mode="fraction",
                         train_split_fraction=0.8)
    assert len(train.cameras) == 5
    assert len(ev.cameras) >= 1
    assert train.images.shape == (5, 16, 16, 3)
    assert train.images.dtype == np.float32
    assert 0 <= train.images.min() and train.images.max() <= 1


def test_poses_centered_and_scaled(tmp_path):
    scene = make_vision_scene(tmp_path, n_frames=6, size=16)
    ds = load_transforms(scene, "train", eval_mode="fraction")
    t = ds.cameras.c2w[:, :3, 3]
    assert np.max(np.abs(t)) <= 1.0 + 1e-5  # auto-scaled into [-1,1]


def test_generate_rays_geometry(tmp_path):
    scene = make_vision_scene(tmp_path, n_frames=4, size=16)
    ds = load_transforms(scene, "train", eval_mode="fraction")
    arrays = camera_arrays(ds.cameras)
    # center pixel ray ~ camera forward (-z in camera frame)
    cx = ds.cameras.cx[0]
    rays = generate_rays(arrays, jnp.asarray([0]),
                         jnp.asarray([int(cx - 0.5)]), jnp.asarray([int(cx - 0.5)]))
    d = np.asarray(rays["directions"][0])
    fwd = -ds.cameras.c2w[0, :3, 2]
    np.testing.assert_allclose(d, fwd / np.linalg.norm(fwd), atol=0.1)
    np.testing.assert_allclose(np.linalg.norm(d), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rays["origins"][0]),
                               ds.cameras.c2w[0, :3, 3], atol=1e-6)


def test_undistort_inverts_distortion():
    """undistort(distort(x)) == x for OPENCV radial+tangential."""
    rng = np.random.default_rng(0)
    xu = rng.uniform(-0.4, 0.4, 32).astype(np.float32)
    yu = rng.uniform(-0.4, 0.4, 32).astype(np.float32)
    d = np.tile(np.array([[-0.05, 0.01, 0.0, 0.0, 0.001, -0.002]], np.float32), (32, 1))

    k1, k2, k3, k4, p1, p2 = d[:, 0], d[:, 1], d[:, 2], d[:, 3], d[:, 4], d[:, 5]
    r2 = xu**2 + yu**2
    radial = 1 + r2 * (k1 + r2 * (k2 + r2 * (k3 + r2 * k4)))
    xd = xu * radial + 2 * p1 * xu * yu + p2 * (r2 + 2 * xu**2)
    yd = yu * radial + p1 * (r2 + 2 * yu**2) + 2 * p2 * xu * yu

    xr, yr = _undistort(jnp.asarray(xd), jnp.asarray(yd), jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(xr), xu, atol=1e-5)
    np.testing.assert_allclose(np.asarray(yr), yu, atol=1e-5)


def test_distortion_key_only_when_nonzero(tmp_path):
    scene = make_vision_scene(tmp_path, n_frames=3, size=16)
    ds = load_transforms(scene, "train", eval_mode="fraction")
    assert "distortion" not in camera_arrays(ds.cameras)
    ds.cameras.distortion[0, 0] = -0.01
    assert "distortion" in camera_arrays(ds.cameras)
