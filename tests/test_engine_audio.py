"""Minimum end-to-end slice: audio-only train -> loss decreases -> eval metrics."""

import numpy as np

import jax
import jax.numpy as jnp

from neraf_tpu.configs.config import (
    AudioModelConfig,
    ExperimentConfig,
    default_config,
)
from neraf_tpu.data.datasets import load_soundspaces_dataset
from neraf_tpu.engine.audio_engine import AudioEngine
from neraf_tpu.engine.checkpoints import latest_checkpoint, restore_checkpoint, save_checkpoint
from neraf_tpu.engine.optimizers import exponential_decay_schedule
from neraf_tpu.models.audio import AudioModel

from fixtures import make_soundspaces_scene


def test_exponential_decay_schedule():
    sched = exponential_decay_schedule(1e-2, 1e-4, max_steps=1000, warmup_steps=0)
    np.testing.assert_allclose(float(sched(0)), 1e-2, rtol=1e-5)
    np.testing.assert_allclose(float(sched(1000)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(500)), 1e-3, rtol=1e-4)

    warm = exponential_decay_schedule(1e-4, 1e-8, max_steps=10000, warmup_steps=100)
    assert float(warm(0)) < 1e-6  # pre-warmup
    np.testing.assert_allclose(float(warm(100)), 1e-4, rtol=1e-4)
    assert float(warm(50)) < 1e-4


def _make_engine(tmp_path, max_len=16, w_field=32, n_freq=257, batch=64):
    scene = make_soundspaces_scene(tmp_path, max_frames=max_len)
    cfg = ExperimentConfig(dataset="SoundSpaces")
    cfg.audio_model = AudioModelConfig(
        dataset="SoundSpaces", max_len=max_len, n_freq_stft=n_freq,
        w_field=w_field, use_grid=False).resolve()
    cfg.audio_data.batch_size = batch
    cfg.audio_data.max_len = max_len
    # faster LR for the smoke test
    cfg.optimizers.audio_fields.lr = 1e-3
    cfg.optimizers.audio_fields.warmup_steps = 0

    train_ds = load_soundspaces_dataset(scene, "train", max_len=max_len)
    eval_ds = load_soundspaces_dataset(scene, "test", max_len=max_len)
    model = AudioModel(config=cfg.audio_model)
    aabb = jnp.asarray(train_ds.outputs.aabb, jnp.float32)
    return AudioEngine(config=cfg, model=model, aabb=aabb), train_ds, eval_ds


def test_train_loss_decreases(tmp_path):
    engine, train_ds, _ = _make_engine(tmp_path)
    state = engine.init_state()
    arrays = train_ds.slice_arrays()

    first = None
    for i in range(60):
        state, metrics = engine.train_step(state, arrays)
        if i == 0:
            first = float(metrics["total_loss"])
    last = float(metrics["total_loss"])
    assert last < first, (first, last)
    assert int(state.step) == 60


def test_eval_produces_metrics(tmp_path):
    engine, train_ds, eval_ds = _make_engine(tmp_path)
    state = engine.init_state()
    res = engine.evaluate(state, eval_ds)
    for k in ("audio_T60_mean_error", "audio_EDT", "audio_C50",
              "num_rays_per_sec_audio", "fps_audio", "quick_audio_mag"):
        assert k in res, k
    assert np.isfinite(res["audio_EDT"])


def test_checkpoint_roundtrip(tmp_path):
    engine, train_ds, _ = _make_engine(tmp_path)
    state = engine.init_state()
    arrays = train_ds.slice_arrays()
    state, _ = engine.train_step(state, arrays)

    path = save_checkpoint(tmp_path / "ckpts", int(state.step), state)
    assert latest_checkpoint(tmp_path / "ckpts") == path

    # a crash mid-save leaves an incomplete *.orbax-checkpoint-tmp dir;
    # resume must skip it and pick the last COMPLETE checkpoint — including
    # orbax TemporaryPath variants that append "-<timestamp>" to the suffix
    (tmp_path / "ckpts" / "step-000000099.orbax-checkpoint-tmp").mkdir()
    (tmp_path / "ckpts"
     / "step-000000100.orbax-checkpoint-tmp-1723881600").mkdir()
    assert latest_checkpoint(tmp_path / "ckpts") == path

    template = engine.init_state()
    restored = restore_checkpoint(path, template)
    assert int(restored.step) == 1
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))
