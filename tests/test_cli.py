"""CLI end-to-end: train a few joint steps, then eval from the saved config."""

import json
import os

import numpy as np
import pytest

from fixtures import make_soundspaces_scene, make_vision_scene


@pytest.fixture
def mini_run(tmp_path, monkeypatch):
    """A combined scene dir with vision + audio fixtures and a tiny config."""
    scene_root = tmp_path / "scenes"
    aud = make_soundspaces_scene(scene_root, max_frames=12)
    make_vision_scene(scene_root, n_frames=3, size=16, scene_dir="mini_scene")

    from neraf_tpu.configs.config import (
        AudioModelConfig,
        VisionModelConfig,
        default_config,
    )

    monkeypatch.setenv("NeRAF_dataset", "SoundSpaces")
    monkeypatch.setenv("NeRAF_scene", "mini_scene")
    cfg = default_config(data_root=str(scene_root))
    cfg.vision_model = VisionModelConfig(
        num_levels=4, log2_hashmap_size=10, base_res=4, max_res=32,
        hidden_dim=16, hidden_dim_color=16, geo_feat_dim=7,
        appearance_embed_dim=4, num_nerf_samples=8,
        num_proposal_samples=(16, 12), eval_num_rays_per_chunk=128)
    cfg.audio_model = AudioModelConfig(
        dataset="SoundSpaces", max_len=12, n_freq_stft=257, w_field=32,
        n_features=1024, resnet_backbone="resnet18").resolve()
    cfg.audio_data.max_len = 12
    cfg.audio_data.batch_size = 32
    cfg.vision_data.train_rays_per_batch = 64
    cfg.trainer.start_step_audio = 1
    cfg.trainer.grid_bake_cells_per_step = 64
    cfg.trainer.steps_per_save = 4
    cfg.trainer.steps_per_eval_all_images = 1000
    cfg.trainer.steps_per_log = 2
    cfg.audio_model.grid_step = 1 / 8
    cfg.output_dir = str(tmp_path / "outputs")
    return cfg, tmp_path


def test_train_and_eval_roundtrip(mini_run):
    cfg, tmp_path = mini_run

    import jax.numpy as jnp

    from neraf_tpu.data.vision_data import camera_arrays
    from neraf_tpu.engine.factory import build_pipeline
    from neraf_tpu.engine.trainer import Trainer

    bundle = build_pipeline(cfg)
    pipe = bundle.pipeline
    trainer = Trainer(config=cfg, pipeline=pipe)

    state = pipe.init_state()
    cam_arrays = camera_arrays(bundle.vision_train.cameras)
    image_arrays = {"images": jnp.asarray(bundle.vision_train.images)}
    audio_arrays = bundle.audio_train.slice_arrays()

    state = trainer.train(
        state,
        step_fn=lambda s: pipe.train_step(s, cam_arrays, audio_arrays, image_arrays),
        max_steps=4,
    )

    # artifacts: config.yml, checkpoint, metrics.jsonl
    assert (trainer.output_dir / "config.yml").exists()
    assert (trainer.output_dir / "metrics.jsonl").exists()
    ckpts = list((trainer.output_dir / "neraf_models").glob("step-*"))
    assert len(ckpts) >= 1

    # eval CLI from the saved config
    from neraf_tpu.cli.evaluate import main as eval_main

    out_json = tmp_path / "results.json"
    eval_main(["--load-config", str(trainer.output_dir / "config.yml"),
               "--output-path", str(out_json)])
    results = json.loads(out_json.read_text())["results"]
    assert "audio_T60_mean_error" in results
    assert "psnr" in results
    assert np.isfinite(results["psnr"])


def test_train_cli_flags_parse():
    from neraf_tpu.cli.train import parse_args

    args = parse_args(["--data-root", "/x", "--viewer-port", "7007",
                       "--audio-only", "--max-iters", "5"])
    assert args.viewer_port == 7007
    assert args.audio_only and args.max_iters == 5


def test_emergency_checkpoint_on_crash(mini_run):
    """A crashing step_fn still leaves a resumable checkpoint behind."""
    import jax.numpy as jnp
    import pytest as _pytest

    from neraf_tpu.data.vision_data import camera_arrays
    from neraf_tpu.engine.factory import build_pipeline
    from neraf_tpu.engine.trainer import Trainer

    cfg, tmp_path = mini_run
    bundle = build_pipeline(cfg)
    pipe = bundle.pipeline
    trainer = Trainer(config=cfg, pipeline=pipe)
    state = pipe.init_state()
    cam_arrays = camera_arrays(bundle.vision_train.cameras)
    image_arrays = {"images": jnp.asarray(bundle.vision_train.images)}
    audio_arrays = bundle.audio_train.slice_arrays()

    calls = {"n": 0}

    def step_fn(s):
        if calls["n"] >= 2:
            raise RuntimeError("simulated preemption")
        calls["n"] += 1
        return pipe.train_step(s, cam_arrays, audio_arrays, image_arrays)

    with _pytest.raises(RuntimeError):
        trainer.train(state, step_fn=step_fn, max_steps=10)

    ckpts = list((trainer.output_dir / "neraf_models").glob("step-*"))
    assert len(ckpts) >= 1  # emergency checkpoint at step 2
    assert any("step-000000002" in str(c) for c in ckpts)


def test_train_cli_set_overrides_reach_saved_config(tmp_path, monkeypatch):
    """--set overrides flow through neraf-train into the run's config.yml
    (so neraf-eval --load-config reproduces the overridden experiment)."""
    scene_root = tmp_path / "scenes"
    make_soundspaces_scene(scene_root, max_frames=12)
    monkeypatch.setenv("NeRAF_dataset", "SoundSpaces")
    monkeypatch.setenv("NeRAF_scene", "mini_scene")

    from neraf_tpu.cli.train import main as train_main

    out_dir = tmp_path / "outputs"
    train_main(["--data-root", str(scene_root), "--audio-only",
                "--max-iters", "3", "--output-dir", str(out_dir),
                "--set", "audio_model.w_field=32",
                "--set", "audio_data.batch_size=16",
                "--set", "audio_data.max_len=12",
                "--set", "audio_model.max_len=12"])

    from neraf_tpu.configs.config import load_config

    run_dirs = sorted((out_dir / "mini_scene_NeRAF" / "NeRAF").iterdir())
    cfg = load_config(run_dirs[-1] / "config.yml")
    assert cfg.audio_model.w_field == 32
    assert cfg.audio_data.batch_size == 16
