"""neraf-viewer: interactive HTTP viewer (ns-viewer analogue).

Usage:
    neraf-viewer --load-config RUN_DIR/config.yml [--load-dir DIR]
                 [--port 7007]
"""

from __future__ import annotations

import argparse
from pathlib import Path

from neraf_tpu.configs.config import load_config
from neraf_tpu.engine.checkpoints import latest_checkpoint, restore_checkpoint
from neraf_tpu.engine.factory import build_pipeline
from neraf_tpu.viz.viewer import ViewerBackend, serve


def parse_args(argv=None):
    p = argparse.ArgumentParser(prog="neraf-viewer")
    p.add_argument("--load-config", required=True)
    p.add_argument("--load-dir", default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7007)
    p.add_argument("--dry-audio-dir", default=None,
                   help="directory of dry wavs servable via GET /auralize "
                        "(disabled when unset; POST works regardless)")
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

    backend = ViewerBackend(pipe, state, fs=cfg.audio_model.fs,
                            dry_audio_dir=args.dry_audio_dir)
    serve(backend, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
