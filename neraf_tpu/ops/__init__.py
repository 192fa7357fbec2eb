"""Compute ops: encodings, samplers, volume rendering, scene contraction, Pallas kernels."""

from neraf_tpu.ops.encodings import (
    nerf_encoding,
    nerf_encoding_dim,
    sh_encoding,
    SH_DIM,
)

__all__ = [
    "nerf_encoding",
    "nerf_encoding_dim",
    "sh_encoding",
    "SH_DIM",
]
