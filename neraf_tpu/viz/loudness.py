"""Loudness maps: dense mic-grid RIR renders -> top-down RMS heatmap.

Rebuild of viz/loudness_maps.ipynb: place a regular microphone grid at the
dataset's mic height, render an RIR per cell (one batched sweep on device),
and reduce each to RMS loudness in dB.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from neraf_tpu.dsp.stft import log_to_magnitude


def render_loudness_grid(render_rirs_fn, source_pose: np.ndarray,
                         rot: np.ndarray, aabb: np.ndarray, height: float,
                         resolution: int = 32) -> dict:
    """Render RIRs on a (resolution x resolution) mic grid at a fixed height.

    Args:
        render_rirs_fn: (mic (N,3), src (N,3), rot (N,3)) -> (N, C, F, T)
            log-magnitude STFTs (e.g. a closure over JointPipeline._render_rirs).
        aabb: (2, 3) audio scene box; the grid spans its x/z extent.
    Returns:
        dict with mic_positions (N,3) and log_stfts (N,C,F,T).
    """
    xs = np.linspace(aabb[0][0], aabb[1][0], resolution)
    zs = np.linspace(aabb[0][2], aabb[1][2], resolution)
    gx, gz = np.meshgrid(xs, zs, indexing="ij")
    mics = np.stack([gx.reshape(-1), np.full(resolution**2, height), gz.reshape(-1)],
                    axis=-1).astype(np.float32)
    n = mics.shape[0]
    src = np.broadcast_to(np.asarray(source_pose, np.float32), (n, 3))
    rots = np.broadcast_to(np.asarray(rot, np.float32), (n, 3))

    log_stfts = render_rirs_fn(jnp.asarray(mics), jnp.asarray(src), jnp.asarray(rots))
    return {"mic_positions": mics, "log_stfts": np.asarray(log_stfts),
            "shape": (resolution, resolution)}


def loudness_map(log_stfts: np.ndarray, shape: tuple[int, int]) -> np.ndarray:
    """(N, C, F, T) log-mag STFTs -> (res, res) RMS loudness in dB."""
    mag = np.asarray(log_to_magnitude(jnp.asarray(log_stfts)))
    rms = np.sqrt(np.mean(mag**2, axis=(1, 2, 3)))
    db = 20.0 * np.log10(rms + 1e-9)
    return db.reshape(shape)
