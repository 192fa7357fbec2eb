"""Acoustic field + audio model: shapes, gradients, reference semantics."""

import numpy as np

import jax
import jax.numpy as jnp

from neraf_tpu.configs.config import AudioModelConfig
from neraf_tpu.fields.acoustic import AcousticSoundField
from neraf_tpu.models.audio import (
    AudioModel,
    encode_query,
    normalize_positions,
    TIME_ENC_DIM,
    POS_ENC_DIM,
)


def test_field_output_shape_and_range():
    field = AcousticSoundField(hidden_w=64, sound_rez=2, n_frequencies=33)
    params = field.init(jax.random.PRNGKey(0), jnp.zeros((4, 100)))
    out = field.apply(params, jax.random.normal(jax.random.PRNGKey(1), (4, 100)))
    assert out.shape == (4, 2, 33)
    # tanh*10 clamp
    assert float(jnp.max(jnp.abs(out))) <= 10.0


def test_normalize_positions_zeroing():
    aabb = jnp.asarray([[0.0, 0.0, 0.0], [2.0, 2.0, 2.0]])
    pos = jnp.asarray([[1.0, 1.0, 1.0], [5.0, 1.0, 1.0]])
    out = np.asarray(normalize_positions(pos, aabb))
    np.testing.assert_allclose(out[0], 0.5)
    np.testing.assert_allclose(out[1], 0.0)  # out-of-box -> zeroed


def test_encode_query_dim():
    aabb = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
    B = 8
    h = encode_query(
        jnp.zeros((B, 3)) + 0.5, jnp.zeros((B, 3)) + 0.5, jnp.zeros((B, 3)) + 0.5,
        jnp.arange(B), aabb, max_len=78)
    assert h.shape == (B, TIME_ENC_DIM + 2 * POS_ENC_DIM + 16)
    assert h.shape == (B, 163)


def _tiny_model(use_grid=False):
    cfg = AudioModelConfig(dataset="SoundSpaces", max_len=24, n_freq_stft=33,
                           w_field=32, use_grid=use_grid).resolve()
    return AudioModel(config=cfg, grid_feature_dim=64 if use_grid else 0)


def _batch(B=16, key=0):
    k = jax.random.PRNGKey(key)
    ks = jax.random.split(k, 4)
    return {
        "time_query": jax.random.randint(ks[0], (B,), 0, 24),
        "mic_pose": jax.random.uniform(ks[1], (B, 3)),
        "source_pose": jax.random.uniform(ks[2], (B, 3)),
        "rot": jax.random.uniform(ks[3], (B, 3)),
    }


def test_audio_model_forward_and_loss():
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    aabb = jnp.asarray([[-1.0, -1.0, -1.0], [2.0, 2.0, 2.0]])
    batch = _batch()
    out = model.apply(params, batch, aabb)
    assert out.shape == (16, 2, 33)

    gt = jax.random.normal(jax.random.PRNGKey(5), (16, 2, 33)) * 0.1
    loss = model.loss(out, gt)
    assert set(loss) == {"audio_sc_loss", "audio_mag_loss"}

    def total(p):
        o = model.apply(p, batch, aabb)
        l = model.loss(o, gt)
        return l["audio_sc_loss"] + l["audio_mag_loss"]

    g = jax.grad(total)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.sum(jnp.abs(x))) > 0 for x in leaves)


def test_audio_model_grid_conditioning():
    model = _tiny_model(use_grid=True)
    params = model.init(jax.random.PRNGKey(0))
    aabb = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
    feat = jax.random.normal(jax.random.PRNGKey(1), (64,))
    out = model.apply(params, _batch(), aabb, grid_feature=feat)
    assert out.shape == (16, 2, 33)


def test_render_rir_full_sweep():
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    aabb = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
    stft = model.render_rir(params, jnp.asarray([0.5, 0.5, 0.5]),
                            jnp.asarray([0.2, 0.2, 0.2]), jnp.asarray([1.0, 0.5, 0.5]), aabb)
    assert stft.shape == (2, 33, 24)

    # the sweep must agree with per-bin forward calls
    batch = {
        "time_query": jnp.asarray([3]),
        "mic_pose": jnp.asarray([[0.5, 0.5, 0.5]]),
        "source_pose": jnp.asarray([[0.2, 0.2, 0.2]]),
        "rot": jnp.asarray([[1.0, 0.5, 0.5]]),
    }
    single = model.apply(params, batch, aabb)  # (1, 2, 33)
    np.testing.assert_allclose(np.asarray(stft[:, :, 3]), np.asarray(single[0]), atol=1e-5)


def test_mse_criterion():
    cfg = AudioModelConfig(dataset="SoundSpaces", max_len=24, n_freq_stft=33,
                           w_field=32, criterion="MSE").resolve()
    model = AudioModel(config=cfg)
    a = jnp.ones((4, 2, 33))
    b = jnp.zeros((4, 2, 33))
    loss = model.loss(a, b)
    np.testing.assert_allclose(float(loss["audio_mse"]), 1e-3, rtol=1e-6)
