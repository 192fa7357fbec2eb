"""neraf-loudness: top-down loudness-map rendering (loudness_maps.ipynb flow).

Usage:
    neraf-loudness --load-config RUN_DIR/config.yml --output-dir DIR
                   [--resolution 48] [--height H] [--source X Y Z]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from neraf_tpu.configs.config import load_config
from neraf_tpu.engine.checkpoints import latest_checkpoint, restore_checkpoint
from neraf_tpu.engine.factory import build_pipeline
from neraf_tpu.viz.loudness import loudness_map, render_loudness_grid


def parse_args(argv=None):
    p = argparse.ArgumentParser(prog="neraf-loudness")
    p.add_argument("--load-config", required=True)
    p.add_argument("--load-dir", default=None)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--resolution", type=int, default=48)
    p.add_argument("--height", type=float, default=None,
                   help="mic height; default: mean train mic height")
    p.add_argument("--source", type=float, nargs=3, default=None,
                   help="source position; default: mean train source pose")
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

    o = bundle.audio_train.outputs
    height = args.height if args.height is not None else float(
        np.mean(o.microphone_poses[:, 1]))
    source = (np.asarray(args.source) if args.source is not None
              else np.mean(o.source_poses, axis=0))
    rot = o.rotations[0]

    def render_fn(mic, src, rots):
        return pipe._render_rirs(state.params, state.batch_stats, state.grid,
                                 mic, src, rots)

    out = render_loudness_grid(render_fn, source, rot,
                               np.asarray(pipe.audio_aabb), height,
                               resolution=args.resolution)
    lm = loudness_map(out["log_stfts"], out["shape"])

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    np.save(out_dir / "loudness_db.npy", lm)

    from matplotlib import cm
    from PIL import Image

    norm = (lm - lm.min()) / max(lm.max() - lm.min(), 1e-9)
    img = (cm.viridis(norm)[..., :3] * 255).astype(np.uint8)
    Image.fromarray(img).resize((512, 512), Image.NEAREST).save(
        out_dir / "loudness_map.png")
    print(f"wrote loudness map ({args.resolution}x{args.resolution}, "
          f"height {height:.2f}) to {out_dir}")


if __name__ == "__main__":
    main()
