"""Assembly: ExperimentConfig -> models + datasets + pipeline.

The counterpart of nerfstudio's config-driven instantiation
(MethodSpecification -> Trainer -> Pipeline -> models/datamanagers), as one
explicit function instead of _target factories.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from neraf_tpu.configs.config import ExperimentConfig
from neraf_tpu.data.datasets import (
    AudioSliceDataset,
    load_raf_dataset,
    load_soundspaces_dataset,
)
from neraf_tpu.data.vision_data import VisionDataset, load_transforms
from neraf_tpu.engine.pipeline import JointPipeline
from neraf_tpu.models.audio import AudioModel
from neraf_tpu.models.resnet3d import ResNet3D
from neraf_tpu.models.vision import VisionModel


@dataclasses.dataclass
class PipelineBundle:
    pipeline: JointPipeline
    vision_train: VisionDataset | None
    vision_eval: VisionDataset | None
    audio_train: AudioSliceDataset
    audio_eval: AudioSliceDataset


def load_audio_split(cfg: ExperimentConfig, split: str) -> AudioSliceDataset:
    acfg = cfg.audio_data
    if cfg.dataset == "RAF":
        return load_raf_dataset(acfg.data_dir, split, fs=acfg.fs)
    return load_soundspaces_dataset(
        acfg.data_dir, split, fs=acfg.fs, max_len=acfg.max_len, hop_len=acfg.hop_len)


def build_pipeline(cfg: ExperimentConfig, mesh=None, with_vision: bool = True,
                   audio_split_override: str | None = None) -> PipelineBundle:
    """Load datasets and construct the joint pipeline."""
    audio_train = load_audio_split(cfg, audio_split_override or "train")
    audio_eval = load_audio_split(cfg, "test")

    vision_train = vision_eval = None
    num_cameras = 1
    if with_vision and cfg.vision_data.data_dir:
        vcfg = cfg.vision_data
        vision_train = load_transforms(
            vcfg.data_dir, "train", eval_mode=vcfg.eval_mode,
            train_split_fraction=vcfg.train_split_fraction,
            downscale_factor=vcfg.downscale_factor)
        vision_eval = load_transforms(
            vcfg.data_dir, "eval", eval_mode=vcfg.eval_mode,
            train_split_fraction=vcfg.train_split_fraction,
            downscale_factor=vcfg.downscale_factor)
        num_cameras = len(vision_train.cameras)

    acfg = cfg.audio_model
    feat_dim = ResNet3D(backbone=acfg.resnet_backbone,
                        n_features=acfg.n_features).feature_dim

    import jax.numpy as jnp

    cdtype = jnp.bfloat16 if cfg.trainer.mixed_precision else jnp.float32
    from neraf_tpu.ops.pallas.fused_pe_mlp import resolve_pe_mlp_fused

    vision_model = VisionModel(config=cfg.vision_model, num_cameras=num_cameras,
                               compute_dtype=cdtype,
                               fused_pe_mlp=resolve_pe_mlp_fused(
                                   cfg.vision_model, mesh))
    audio_model = AudioModel(
        config=acfg, grid_feature_dim=feat_dim if acfg.use_grid else 0,
        compute_dtype=cdtype)

    grid_res = int(round(1.0 / acfg.grid_step))
    pipeline = JointPipeline(
        config=cfg,
        vision_model=vision_model,
        audio_model=audio_model,
        audio_aabb=jnp.asarray(audio_train.outputs.aabb, jnp.float32),
        vision_aabb=jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]]),
        grid_res=grid_res,
        mesh=mesh,
    )
    return PipelineBundle(pipeline, vision_train, vision_eval, audio_train, audio_eval)
