"""Experiment configuration.

A plain-dataclass config tree replacing nerfstudio's MethodSpecification /
_target-factory lattice (reference NeRAF_config.py:32-139). The same three
tiers are preserved:

1. dataclass defaults (per-component configs below),
2. the experiment "header" resolved by `default_config(dataset, scene)` —
   per-dataset fs / STFT geometry / per-scene max_len tables mirroring
   NeRAF_config.py:41-61,
3. environment variables: ``NeRAF_dataset``, ``NeRAF_scene`` select the
   experiment (NeRAF_config.py:36-39) and ``AVN_RENDER_POSES`` switches the
   audio data stack to inference mode (NeRAF_datamanager.py:200-203).

Configs serialize to YAML per run and round-trip for `neraf-eval
--load-config`, mirroring nerfstudio's config.yml contract.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import yaml

# Per-scene STFT frame counts (reference NeRAF_config.py:43)
SOUNDSPACES_MAX_LEN = {
    "office_4": 78,
    "room_2": 84,
    "frl_apartment_2": 107,
    "frl_apartment_4": 103,
    "apartment_2": 86,
    "apartment_1": 101,
}


@dataclass
class AudioModelConfig:
    """Acoustic field model (reference NeRAFAudioModelConfig, NeRAF_model.py:82-101)."""

    dataset: str = "SoundSpaces"
    use_grid: bool = True
    grid_step: float = 1.0 / 128.0
    n_features: int = 1024
    use_multiple_viewing_directions: bool = True
    loss_factor: float = 1e-3
    max_len: int = 76
    w_field: int = 512
    fs: int = 22050
    criterion: str = "SC+SLMSE"
    n_freq_stft: int = 257
    hop_len: int = 128
    win_len: int = 512
    resnet_backbone: str = "resnet50"

    def resolve(self) -> "AudioModelConfig":
        """Apply the per-dataset derivations of reference NeRAF_model.py:109-134."""
        cfg = dataclasses.replace(self)
        if cfg.dataset == "RAF":
            cfg.fs = 48000
            cfg.n_freq_stft = 513
            cfg.hop_len = 256
            cfg.win_len = 512
            # RAF caps RIRs at 0.32 s -> frames (NeRAF_model.py:128)
            cfg.max_len = int(0.32 * cfg.fs) // cfg.hop_len
            cfg.mic_ch = 1
        else:
            cfg.mic_ch = 2
        return cfg

    # populated by resolve()
    mic_ch: int = 2

    @property
    def n_fft(self) -> int:
        return (self.n_freq_stft - 1) * 2


@dataclass
class VisionModelConfig:
    """Nerfacto-class radiance model configuration.

    Two position-encoding backends:
    - "fourier" (default): sinusoidal PE + a deep base MLP (mip-NeRF-360
      style). Zero gathers — everything lands on the MXU, ~10x more steps/s
      than the gather-bound hash path on the target TPU backend; the
      default because the reference's 400k-step budget is throughput-bound.
    - "hash": instant-NGP multires hash grid + shallow MLP (the reference's
      tcnn substrate). Trains on TPU via the sort-based table gradients
      (hash_grad_mode; docs/HASH_PERF.md round-3 note) and converges much
      faster per step — on the occluded multi-object benchmark it passes
      fourier's 8000-step quality within ~300 steps and plateaus higher
      (24.0 vs 22.7 PSNR, VALIDATION.md) — so it is the QUALITY choice
      when wall-clock is dominated by convergence rather than a fixed step
      budget. Gather-bound; the TPU-tuned default layout is L8xF4 (same
      32-dim output and table bytes as tcnn's L16xF2 but half the gather
      rows — the measured cost driver, docs/HASH_PERF.md). Set
      num_levels=16, features_per_level=2 for strict tcnn-parity layout.
      With "hash", proposal fields stay on fourier by default
      (proposal_encoding) — proposal stages evaluate ~7x more points than
      the final field, so putting gathers there dominates step time.
    """

    encoding: str = "fourier"  # "fourier" | "hash"
    # fourier encoding + deep base MLP
    num_frequencies: int = 10
    base_mlp_width: int = 256
    base_mlp_layers: int = 4
    # hash encoding
    num_levels: int = 8
    features_per_level: int = 4
    log2_hashmap_size: int = 19
    base_res: int = 16
    max_res: int = 2048
    # hash-table gradient strategy: "auto" picks scatter_set on TPU (the
    # backend's scatter-add crashes the worker, docs/HASH_PERF.md:67-92) and
    # XLA-native scatter elsewhere; see ops/hashgrid.py gather_rows
    hash_grad_mode: str = "auto"
    proposal_encoding: str = "fourier"  # encoding for proposal density fields
    # fourier PE+MLP execution: "auto" uses the fused Pallas kernel
    # (ops/pallas/fused_pe_mlp.py) on unmeshed TPU runs when its AOT probe
    # compiles, else the XLA layer chain; "fused"/"xla" force either.
    # Env NERAF_PE_MLP={fused,xla} overrides (A/B harness).
    pe_mlp_impl: str = "auto"
    # field MLPs
    hidden_dim: int = 64
    hidden_dim_color: int = 64
    geo_feat_dim: int = 15
    appearance_embed_dim: int = 32
    average_init_density: float = 0.01  # reference NeRAF_config.py:96
    # sampling
    num_nerf_samples: int = 48
    num_proposal_samples: tuple = (256, 96)
    proposal_update_every: int = 5
    proposal_warmup: int = 5000
    use_single_jitter: bool = True
    # losses
    interlevel_loss_mult: float = 1.0
    distortion_loss_mult: float = 0.002
    # rendering
    eval_num_rays_per_chunk: int = 1 << 15
    background_color: str = "last_sample"
    # camera pose optimization (SO3xR3, reference NeRAF_config.py:97)
    camera_opt_mode: str = "SO3xR3"


@dataclass
class AudioDataConfig:
    """Audio data stack (reference NeRAFDataManagerConfig + dataparser configs)."""

    data_dir: str = ""
    dataset: str = "SoundSpaces"
    batch_size: int = 2048  # STFT slices per step (NeRAF_config.py:47)
    fs: int = 22050
    max_len: int = 78
    hop_len: int = 128
    # data-path selection: "off" = whole split in HBM (fastest, small
    # scenes), "on" = host-resident log-STFT streamed per batch
    # (data/streaming.py), "auto" = stream when the split exceeds
    # stream_threshold_gb (apartment-scale scenes don't fit a 16 GB chip
    # next to the model — docs/DATA.md has the per-scene table)
    streaming: str = "auto"
    stream_threshold_gb: float = 8.0
    # host->device dtype for streamed STFT-column batches. bfloat16 halves
    # the per-step transfer (~4.2 MB -> 2.1 MB at 2048x2x257) for a <=2^-8
    # relative quantization of the log-magnitudes (upcast to fp32 in-jit,
    # loader.resolve_audio_batch); the transfer link is what bounds the
    # streamed path, so this is the production default. Set "float32" for
    # bit-exact parity with the HBM path.
    stream_transfer_dtype: str = "bfloat16"


@dataclass
class VisionDataConfig:
    """Vision data stack (transforms.json / ray batches)."""

    data_dir: str = ""
    train_rays_per_batch: int = 4096
    eval_rays_per_batch: int = 4096
    eval_mode: str = "filename"  # 'fraction' for RAF (NeRAF_config.py:46,56)
    train_split_fraction: float = 0.9
    downscale_factor: int = 1


@dataclass
class OptimizerGroupConfig:
    lr: float = 1e-2
    eps: float = 1e-15
    lr_final: float = 1e-4
    max_steps: int = 200000
    warmup_steps: int = 0


@dataclass
class OptimizersConfig:
    """The four named param groups of reference NeRAF_config.py:115-132."""

    proposal_networks: OptimizerGroupConfig = field(
        default_factory=lambda: OptimizerGroupConfig(lr=1e-2, lr_final=1e-4, max_steps=200000))
    fields: OptimizerGroupConfig = field(
        default_factory=lambda: OptimizerGroupConfig(lr=1e-2, lr_final=1e-4, max_steps=200000))
    audio_fields: OptimizerGroupConfig = field(
        default_factory=lambda: OptimizerGroupConfig(
            lr=1e-4, lr_final=1e-8, max_steps=1002000, warmup_steps=2000))
    camera_opt: OptimizerGroupConfig = field(
        default_factory=lambda: OptimizerGroupConfig(lr=1e-3, lr_final=1e-4, max_steps=5000))


@dataclass
class MeshConfig:
    """SPMD mesh layout. data: batch sharding; model: optional tensor sharding."""

    data_axis: int = -1  # -1: use all available devices
    model_axis: int = 1


@dataclass
class TrainerConfig:
    """Engine settings (reference TrainerConfig usage, NeRAF_config.py:70-136)."""

    max_num_iterations: int = 400001
    start_step_audio: int = 2000
    steps_per_eval_batch: int = 10000
    steps_per_eval_image: int = 10000
    steps_per_eval_all_images: int = 10000
    steps_per_save: int = 20000
    save_only_latest_checkpoint: bool = False
    mixed_precision: bool = True  # bf16 compute on TPU (no grad scaler needed)
    grid_bake_cells_per_step: int = 4096
    steps_per_log: int = 100


@dataclass
class ExperimentConfig:
    method_name: str = "NeRAF"
    experiment_name: str = "experiment"
    dataset: str = "SoundSpaces"
    scene: str = "office_4"
    output_dir: str = "./outputs"
    eval_save_dir: str | None = None
    seed: int = 42

    trainer: TrainerConfig = field(default_factory=TrainerConfig)
    audio_model: AudioModelConfig = field(default_factory=AudioModelConfig)
    vision_model: VisionModelConfig = field(default_factory=VisionModelConfig)
    audio_data: AudioDataConfig = field(default_factory=AudioDataConfig)
    vision_data: VisionDataConfig = field(default_factory=VisionDataConfig)
    optimizers: OptimizersConfig = field(default_factory=OptimizersConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)


def default_config(dataset: str | None = None, scene: str | None = None,
                   data_root: str | None = None) -> ExperimentConfig:
    """Build the experiment config for a dataset/scene pair.

    Applies the reference's experiment-header logic (NeRAF_config.py:32-67)
    including the env-var overrides NeRAF_dataset / NeRAF_scene.
    """
    dataset = os.environ.get("NeRAF_dataset", dataset or "RAF")
    scene = os.environ.get("NeRAF_scene", scene or ("FurnishedRoom" if dataset == "RAF" else "office_4"))

    cfg = ExperimentConfig(dataset=dataset, scene=scene,
                           experiment_name=f"{scene}_NeRAF")

    if dataset == "SoundSpaces":
        fs = 22050
        max_len = SOUNDSPACES_MAX_LEN.get(scene, 78)
        cfg.audio_model = AudioModelConfig(dataset=dataset, fs=fs, max_len=max_len).resolve()
        cfg.audio_data = AudioDataConfig(dataset=dataset, fs=fs, max_len=max_len, hop_len=128)
        cfg.vision_data.eval_mode = "filename"
        cfg.optimizers.audio_fields.warmup_steps = cfg.trainer.start_step_audio
    else:
        cfg.audio_model = AudioModelConfig(dataset="RAF").resolve()
        cfg.audio_data = AudioDataConfig(dataset="RAF", fs=48000,
                                         max_len=cfg.audio_model.max_len, hop_len=256)
        cfg.vision_data.eval_mode = "fraction"
        cfg.optimizers.audio_fields.warmup_steps = cfg.trainer.start_step_audio

    if data_root is not None:
        base = Path(data_root) / scene
        cfg.audio_data.data_dir = str(base)
        cfg.vision_data.data_dir = str(base)
    return cfg


def _to_dict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj):
        return {f.name: _to_dict(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [_to_dict(v) for v in obj]
    return obj


def _from_dict(cls, d: dict) -> Any:
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        # f.type is a string under `from __future__ import annotations`;
        # nested dataclasses are resolved by field name instead.
        if f.name in _NESTED and isinstance(v, dict):
            kwargs[f.name] = _from_dict(_NESTED[f.name], v)
        elif isinstance(v, list):
            kwargs[f.name] = tuple(v)
        else:
            kwargs[f.name] = v
    return cls(**kwargs)


_NESTED = {
    "trainer": TrainerConfig,
    "audio_model": AudioModelConfig,
    "vision_model": VisionModelConfig,
    "audio_data": AudioDataConfig,
    "vision_data": VisionDataConfig,
    "optimizers": OptimizersConfig,
    "mesh": MeshConfig,
    "proposal_networks": OptimizerGroupConfig,
    "fields": OptimizerGroupConfig,
    "audio_fields": OptimizerGroupConfig,
    "camera_opt": OptimizerGroupConfig,
}


def apply_overrides(cfg: ExperimentConfig,
                    overrides: list[str]) -> ExperimentConfig:
    """Apply dotted-path ``key=value`` overrides in place (returns cfg).

    The tyro-flag-surface equivalent: nerfstudio's CLI exposes every config
    dataclass field as a flag; here ``neraf-train --set
    vision_model.encoding=hash --set trainer.max_iters=1000`` reaches any
    field of the tree. Values are parsed as YAML scalars (so ``true``,
    ``1e-3``, ``[16, 12]`` and quoted strings all work) and lists coerce to
    tuples to match dataclass defaults. Unknown paths raise with the valid
    field names.
    """
    for item in overrides:
        path, sep, raw = item.partition("=")
        if not sep:
            raise ValueError(f"override {item!r} is not of the form key=value")
        parts = path.strip().split(".")
        obj = cfg
        for i, name in enumerate(parts[:-1]):
            if not (dataclasses.is_dataclass(obj) and
                    any(f.name == name for f in dataclasses.fields(obj))):
                valid = [f.name for f in dataclasses.fields(obj)] \
                    if dataclasses.is_dataclass(obj) else []
                raise ValueError(
                    f"override path {'.'.join(parts[:i + 1])!r} not found; "
                    f"valid fields here: {valid}")
            obj = getattr(obj, name)
        leaf = parts[-1]
        if not (dataclasses.is_dataclass(obj) and
                any(f.name == leaf for f in dataclasses.fields(obj))):
            valid = [f.name for f in dataclasses.fields(obj)] \
                if dataclasses.is_dataclass(obj) else []
            raise ValueError(
                f"override field {path!r} not found; valid fields: {valid}")
        value = yaml.safe_load(raw)
        if isinstance(value, list):
            value = tuple(value)
        current = getattr(obj, leaf)
        if isinstance(value, str) and isinstance(current, (int, float)) \
                and not isinstance(current, bool):
            # YAML 1.1 reads "1e-3" (no dot) as a string; coerce numerics
            # toward the field's current type
            value = type(current)(float(value))
        elif isinstance(current, str) and not isinstance(value, str) \
                and value is not None:
            # YAML 1.1 reads on/off/yes/no as booleans and bare numbers as
            # ints — for a str-typed field keep the user's literal text, so
            # e.g. `--set audio_data.streaming=off` stores "off", not False
            # (which would silently fall back to the auto heuristic).
            value = raw.strip()
        setattr(obj, leaf, value)
    return cfg


def save_config(cfg: ExperimentConfig, path: str | Path) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(_to_dict(cfg), f, sort_keys=False)


def load_config(path: str | Path) -> ExperimentConfig:
    with open(path) as f:
        d = yaml.safe_load(f)
    return _from_dict(ExperimentConfig, d)
