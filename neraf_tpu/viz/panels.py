"""Image panels: STFT comparison strips and grid top-down views.

Rebuild of the reference's eval image logging (NeRAF_model.py:694-723,
763-803): viridis-colormapped predicted-vs-GT STFT panels normalized by the
GT min/max, and mean-over-height top views of the baked scene grid.
"""

from __future__ import annotations

import numpy as np
from matplotlib import cm


def _viridis(x: np.ndarray) -> np.ndarray:
    return cm.viridis(x)[..., :3]


def stft_comparison_panel(pred_log: np.ndarray, gt_log: np.ndarray) -> np.ndarray:
    """(F, T) predicted + GT log-STFTs -> (F, 2T, 3) colormapped panel.

    Frequency axis flipped (low at bottom) and both halves normalized by the
    GT min/max, matching the reference's logging.
    """
    pred = np.flipud(np.asarray(pred_log))
    gt = np.flipud(np.asarray(gt_log))
    lo, hi = gt.min(), gt.max()
    scale = max(hi - lo, 1e-9)
    pred_n = np.clip((pred - lo) / scale, 0, 1)
    gt_n = np.clip((gt - lo) / scale, 0, 1)
    return np.concatenate([_viridis(pred_n), _viridis(gt_n)], axis=1)


def grid_top_view(grid_flat: np.ndarray, grid_res: int) -> dict:
    """(N_cells, 7) baked grid -> mean-over-height color and density maps."""
    vol = np.asarray(grid_flat).reshape(grid_res, grid_res, grid_res, 7)
    colors = vol[..., :3].mean(axis=2)  # mean over the up axis
    density = vol[..., 3].mean(axis=2)
    d = density - density.min()
    d = d / max(d.max(), 1e-9)
    return {"color": colors, "density": _viridis(d)}
