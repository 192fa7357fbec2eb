"""Config tree: per-dataset resolution, env overrides, YAML round-trip."""

import dataclasses

from neraf_tpu.configs.config import (
    AudioModelConfig,
    ExperimentConfig,
    default_config,
    load_config,
    save_config,
    SOUNDSPACES_MAX_LEN,
)


def test_raf_resolution():
    cfg = AudioModelConfig(dataset="RAF").resolve()
    assert cfg.fs == 48000
    assert cfg.n_freq_stft == 513
    assert cfg.hop_len == 256
    assert cfg.max_len == 60  # int(0.32*48000)//256
    assert cfg.mic_ch == 1
    assert cfg.n_fft == 1024


def test_soundspaces_resolution():
    cfg = AudioModelConfig(dataset="SoundSpaces", max_len=78).resolve()
    assert cfg.fs == 22050
    assert cfg.mic_ch == 2
    assert cfg.n_freq_stft == 257


def test_default_config_env_override(monkeypatch):
    monkeypatch.setenv("NeRAF_dataset", "SoundSpaces")
    monkeypatch.setenv("NeRAF_scene", "room_2")
    cfg = default_config()
    assert cfg.dataset == "SoundSpaces"
    assert cfg.scene == "room_2"
    assert cfg.audio_model.max_len == SOUNDSPACES_MAX_LEN["room_2"]
    assert cfg.experiment_name == "room_2_NeRAF"
    assert cfg.optimizers.audio_fields.warmup_steps == cfg.trainer.start_step_audio


def test_default_config_raf(monkeypatch):
    monkeypatch.delenv("NeRAF_dataset", raising=False)
    monkeypatch.delenv("NeRAF_scene", raising=False)
    cfg = default_config("RAF", "FurnishedRoom", data_root="/data/RAF")
    assert cfg.audio_model.max_len == 60
    assert cfg.vision_data.eval_mode == "fraction"
    assert cfg.audio_data.data_dir.endswith("FurnishedRoom")


def test_yaml_roundtrip(tmp_path):
    cfg = default_config("SoundSpaces", "office_4", data_root="/data/SS")
    cfg.trainer.max_num_iterations = 1234
    cfg.optimizers.audio_fields.lr = 3e-4
    cfg.vision_model.num_proposal_samples = (128, 48)

    path = tmp_path / "config.yml"
    save_config(cfg, path)
    loaded = load_config(path)

    assert loaded == cfg
    assert isinstance(loaded.vision_model.num_proposal_samples, tuple)
    assert loaded.optimizers.audio_fields.lr == 3e-4


def test_apply_overrides_dotted_paths():
    """--set key=value overrides: the tyro-flag-surface equivalent of
    nerfstudio exposing every dataclass field as a CLI flag."""
    import pytest

    from neraf_tpu.configs.config import apply_overrides, default_config

    cfg = default_config("SoundSpaces", "office_4", data_root="/x")
    apply_overrides(cfg, [
        "vision_model.encoding=hash",
        "vision_model.num_levels=4",
        "vision_model.features_per_level=8",
        "trainer.start_step_audio=0",
        "audio_model.use_grid=false",
        "optimizers.fields.lr=1e-3",
        "vision_model.num_proposal_samples=[32, 16]",
    ])
    assert cfg.vision_model.encoding == "hash"
    assert cfg.vision_model.num_levels == 4
    assert cfg.vision_model.features_per_level == 8
    assert cfg.trainer.start_step_audio == 0
    assert cfg.audio_model.use_grid is False
    assert cfg.optimizers.fields.lr == pytest.approx(1e-3)
    assert cfg.vision_model.num_proposal_samples == (32, 16)

    with pytest.raises(ValueError, match="valid fields"):
        apply_overrides(cfg, ["vision_model.nope=1"])
    with pytest.raises(ValueError, match="valid fields"):
        apply_overrides(cfg, ["nonexistent.thing=1"])
    with pytest.raises(ValueError, match="key=value"):
        apply_overrides(cfg, ["just-a-string"])


def test_apply_overrides_keeps_yaml11_booleans_as_str_for_str_fields():
    """`--set audio_data.streaming=off` must store the STRING "off": YAML 1.1
    reads on/off/yes/no as booleans, and a bool in the str-typed field would
    match neither 'on' nor 'off' — silently re-enabling the auto heuristic
    the user explicitly turned off (ADVICE r3, medium)."""
    from neraf_tpu.configs.config import apply_overrides, default_config

    cfg = default_config("SoundSpaces", "office_4", data_root="/x")
    apply_overrides(cfg, ["audio_data.streaming=off"])
    assert cfg.audio_data.streaming == "off"
    apply_overrides(cfg, ["audio_data.streaming=on"])
    assert cfg.audio_data.streaming == "on"
    # bool-typed fields still parse YAML booleans
    apply_overrides(cfg, ["audio_model.use_grid=off"])
    assert cfg.audio_model.use_grid is False
    # bare numbers into str-typed fields keep the literal text too
    apply_overrides(cfg, ["audio_data.streaming=1"])
    assert cfg.audio_data.streaming == "1"


def test_cli_set_flag_parses():
    from neraf_tpu.cli.train import parse_args

    args = parse_args(["--data-root", "/x",
                       "--set", "vision_model.encoding=hash",
                       "--set", "trainer.max_iters=10"])
    assert args.overrides == ["vision_model.encoding=hash",
                              "trainer.max_iters=10"]


def test_apply_overrides_path_through_scalar_errors_cleanly():
    import pytest

    from neraf_tpu.configs.config import apply_overrides, default_config

    cfg = default_config("SoundSpaces", "office_4", data_root="/x")
    with pytest.raises(ValueError, match="not found"):
        apply_overrides(cfg, ["trainer.max_iters.x=1"])


def test_eval_cli_set_flag_parses():
    from neraf_tpu.cli.evaluate import parse_args

    args = parse_args(["--load-config", "/x/config.yml",
                       "--set", "vision_model.eval_num_rays_per_chunk=8192"])
    assert args.overrides == ["vision_model.eval_num_rays_per_chunk=8192"]
