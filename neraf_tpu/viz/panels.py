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


def save_eval_images(images: dict, out_dir, step: int) -> list:
    """Persist an eval_image() images dict as PNGs under out_dir.

    The reference saves per-view eval renders + STFT panels during its eval
    sweep (NeRAF_pipeline.py:329-338); this is the in-training analogue for
    the pipeline.eval_image outputs (rgb in [0,1], scalar depth/accumulation
    maps, colormapped comparison panels). Returns the written paths.
    """
    from pathlib import Path

    from PIL import Image

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    written = []
    for name, img in images.items():
        arr = np.asarray(img, dtype=np.float32)
        if arr.ndim == 2:  # scalar map -> viridis
            lo, hi = arr.min(), arr.max()
            arr = _viridis((arr - lo) / max(hi - lo, 1e-9))
        elif arr.ndim == 3 and arr.shape[-1] == 1:
            a = arr[..., 0]
            lo, hi = a.min(), a.max()
            arr = _viridis((a - lo) / max(hi - lo, 1e-9))
        path = out_dir / f"step_{step:07d}_{name}.png"
        Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(path)
        written.append(path)
    return written


def grid_top_view(grid_flat: np.ndarray, grid_res: int) -> dict:
    """(N_cells, 7) baked grid -> mean-over-height color and density maps."""
    vol = np.asarray(grid_flat).reshape(grid_res, grid_res, grid_res, 7)
    colors = vol[..., :3].mean(axis=2)  # mean over the up axis
    density = vol[..., 3].mean(axis=2)
    d = density - density.min()
    d = d / max(d.max(), 1e-9)
    return {"color": colors, "density": _viridis(d)}
