"""Multi-device SPMD: the joint train step compiles and runs on an 8-way mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neraf_tpu.parallel.sharding import batch_sharding, make_mesh, replicated

from test_joint_pipeline import _make_pipeline
from neraf_tpu.data.vision_data import camera_arrays


def test_mesh_creation():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices())
    mesh4 = make_mesh(4)
    assert mesh4.devices.size == 4


def test_sharded_matmul_runs():
    mesh = make_mesh()
    n = mesh.devices.size
    x = jnp.ones((8 * n, 128))
    w = jnp.ones((128, 64))

    @jax.jit
    def f(x, w):
        x = jax.lax.with_sharding_constraint(x, batch_sharding(mesh))
        w = jax.lax.with_sharding_constraint(w, replicated(mesh))
        return jnp.mean(x @ w)

    out = float(f(x, w))
    np.testing.assert_allclose(out, 128.0, rtol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_joint_train_step_on_mesh(tmp_path):
    """Full joint step with data sharding over 8 devices, one step executes."""
    pipe, vds, ads, _ = _make_pipeline(tmp_path)
    pipe.mesh = make_mesh(8)
    # re-jit with the mesh in place
    pipe._train_step = jax.jit(pipe._train_step_impl, donate_argnums=(0,))

    state = pipe.init_state()
    cam_arrays = camera_arrays(vds.cameras)
    image_arrays = {"images": jnp.asarray(vds.images)}
    audio_arrays = ads.slice_arrays()

    state, metrics = pipe.train_step(state, cam_arrays, audio_arrays, image_arrays)
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["total_loss"]))
