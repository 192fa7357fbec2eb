"""Typed config tree with YAML round-trip and reference-compatible env overrides."""

from neraf_tpu.configs.config import (
    AudioModelConfig,
    VisionModelConfig,
    AudioDataConfig,
    VisionDataConfig,
    OptimizerGroupConfig,
    OptimizersConfig,
    MeshConfig,
    TrainerConfig,
    ExperimentConfig,
    default_config,
    load_config,
    save_config,
    SOUNDSPACES_MAX_LEN,
)

__all__ = [
    "AudioModelConfig",
    "VisionModelConfig",
    "AudioDataConfig",
    "VisionDataConfig",
    "OptimizerGroupConfig",
    "OptimizersConfig",
    "MeshConfig",
    "TrainerConfig",
    "ExperimentConfig",
    "default_config",
    "load_config",
    "save_config",
    "SOUNDSPACES_MAX_LEN",
]
