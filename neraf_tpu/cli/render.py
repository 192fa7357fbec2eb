"""neraf-render: render eval-view images (ns-render analogue).

Usage:
    neraf-render --load-config RUN_DIR/config.yml [--load-dir DIR]
                 --output-dir DIR [--split eval|train]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
from PIL import Image

from neraf_tpu.configs.config import load_config
from neraf_tpu.data.vision_data import camera_arrays
from neraf_tpu.engine.checkpoints import latest_checkpoint, restore_checkpoint
from neraf_tpu.engine.factory import build_pipeline


def parse_args(argv=None):
    p = argparse.ArgumentParser(prog="neraf-render")
    p.add_argument("--load-config", required=True)
    p.add_argument("--load-dir", default=None)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--split", default="eval", choices=["eval", "train"])
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from neraf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = load_config(args.load_config)
    run_dir = Path(args.load_config).parent

    bundle = build_pipeline(cfg)
    pipe = bundle.pipeline

    ckpt_dir = Path(args.load_dir) if args.load_dir else run_dir / "neraf_models"
    path = latest_checkpoint(ckpt_dir)
    if path is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    state = restore_checkpoint(path, pipe.init_state())

    ds = bundle.vision_eval if args.split == "eval" else bundle.vision_train
    cams = camera_arrays(ds.cameras)
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    H, W = ds.cameras.height, ds.cameras.width
    for i in range(len(ds.cameras)):
        out = pipe.render_image(state, cams, i, H, W)
        rgb = (np.clip(out["rgb"], 0, 1) * 255).astype(np.uint8)
        Image.fromarray(rgb).save(out_dir / f"render_{i:04d}.png")
        depth = out["depth"]
        np.save(out_dir / f"depth_{i:04d}.npy", depth)
    print(f"rendered {len(ds.cameras)} views to {out_dir}")


if __name__ == "__main__":
    main()
