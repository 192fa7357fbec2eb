"""Data layer: dataparsers, STFT-slice datasets, device batch samplers."""

from neraf_tpu.data.dataparsers import (
    AudioParserOutputs,
    parse_raf,
    parse_soundspaces,
    parse_inference_poses_raf,
    parse_inference_poses_soundspaces,
)
from neraf_tpu.data.datasets import AudioSliceDataset, load_raf_dataset, load_soundspaces_dataset
from neraf_tpu.data.loader import AudioBatchSampler

__all__ = [
    "AudioParserOutputs",
    "parse_raf",
    "parse_soundspaces",
    "parse_inference_poses_raf",
    "parse_inference_poses_soundspaces",
    "AudioSliceDataset",
    "load_raf_dataset",
    "load_soundspaces_dataset",
    "AudioBatchSampler",
]
