"""neraf-eval: the ns-eval equivalent.

Usage:
    neraf-eval --load-config RUN_DIR/config.yml [--load-dir CKPT_DIR]
               [--output-path results.json] [--render-output-path DIR]

With AVN_RENDER_POSES set (reference NeRAF_dataparser.py:134), the audio
data stack switches to trajectory-inference mode and raw predicted STFTs are
written per pose to --render-output-path, matching the reference flow used by
the video/loudness-map notebooks.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from neraf_tpu.configs.config import load_config
from neraf_tpu.data.vision_data import camera_arrays
from neraf_tpu.engine.checkpoints import latest_checkpoint, restore_checkpoint
from neraf_tpu.engine.factory import build_pipeline
from neraf_tpu.engine.trainer import Trainer


def parse_args(argv=None):
    p = argparse.ArgumentParser(prog="neraf-eval")
    p.add_argument("--load-config", required=True)
    p.add_argument("--load-dir", default=None,
                   help="checkpoint dir; default <config dir>/neraf_models")
    p.add_argument("--output-path", default=None)
    p.add_argument("--render-output-path", default=None)
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="override loaded-config fields by dotted path, e.g. "
                        "--set vision_model.eval_num_rays_per_chunk=8192; "
                        "model-architecture fields must match the checkpoint")
    return p.parse_args(argv)


def _eval_audio_only(cfg, run_dir, args):
    """Eval path for --audio-only runs (grid-free acoustic field)."""
    import jax.numpy as jnp

    from neraf_tpu.engine.audio_engine import AudioEngine
    from neraf_tpu.engine.factory import load_audio_split
    from neraf_tpu.models.audio import AudioModel

    audio_train = load_audio_split(cfg, "train")
    audio_eval = load_audio_split(cfg, "test")
    model = AudioModel(config=cfg.audio_model)
    engine = AudioEngine(config=cfg, model=model,
                         aabb=jnp.asarray(audio_train.outputs.aabb, jnp.float32))

    ckpt_dir = Path(args.load_dir) if args.load_dir else run_dir / "neraf_models"
    path = latest_checkpoint(ckpt_dir)
    if path is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    state = restore_checkpoint(path, engine.init_state())

    results = engine.evaluate(state, audio_eval)
    if args.output_path:
        Trainer(config=cfg, pipeline=engine, output_dir=run_dir).write_eval_json(
            results, args.output_path)
    print(results)
    return results


def main(argv=None):
    args = parse_args(argv)
    from neraf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = load_config(args.load_config)
    if args.overrides:
        from neraf_tpu.configs.config import apply_overrides

        apply_overrides(cfg, args.overrides)
    run_dir = Path(args.load_config).parent

    if not cfg.audio_model.use_grid:
        return _eval_audio_only(cfg, run_dir, args)

    # LPIPS status up front (reference always reports it, NeRAF_pipeline.py:328):
    # a user without converted weights learns WHY the column will be null
    # before the sweep runs, not after digging through the JSON.
    from neraf_tpu.metrics.lpips_impl import resolve_default_weights

    lpips_path = resolve_default_weights()
    if lpips_path is None:
        print("lpips: SKIPPED — no pretrained weights resolved; convert once "
              "with metrics.lpips_impl.params_from_torch_state_dicts (see "
              "README 'LPIPS weights') and set NERAF_LPIPS_WEIGHTS or drop "
              "the .npz under ~/.cache/neraf/", flush=True)
    else:
        print(f"lpips: using weights {lpips_path}", flush=True)

    inference_mode = "AVN_RENDER_POSES" in os.environ
    bundle = build_pipeline(
        cfg, audio_split_override="inference" if inference_mode else None)
    pipe = bundle.pipeline

    ckpt_dir = Path(args.load_dir) if args.load_dir else run_dir / "neraf_models"
    path = latest_checkpoint(ckpt_dir)
    if path is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    state = restore_checkpoint(path, pipe.init_state())

    trainer = Trainer(config=cfg, pipeline=pipe, output_dir=run_dir)
    results = {}

    if inference_mode:
        # trajectory render: raw predicted STFTs per pose
        o = bundle.audio_train.outputs
        log_pred = pipe._render_rirs(
            state.params, state.batch_stats, state.grid,
            jnp.asarray(o.microphone_poses, jnp.float32),
            jnp.asarray(o.source_poses, jnp.float32),
            jnp.asarray(o.rotations, jnp.float32))
        out_dir = Path(args.render_output_path or run_dir / "renders")
        out_dir.mkdir(parents=True, exist_ok=True)
        for i in range(log_pred.shape[0]):
            np.save(out_dir / f"stft_{i:05d}.npy", np.asarray(log_pred[i]))
        results["num_rendered"] = int(log_pred.shape[0])
    else:
        if bundle.vision_eval is not None and len(bundle.vision_eval.cameras):
            results.update(pipe.evaluate_vision(
                state, camera_arrays(bundle.vision_eval.cameras),
                bundle.vision_eval.images))
        results.update(pipe.evaluate_audio(state, bundle.audio_eval))

        if args.render_output_path:
            out_dir = Path(args.render_output_path)
            out_dir.mkdir(parents=True, exist_ok=True)
            o = bundle.audio_eval.outputs
            log_pred = pipe._render_rirs(
                state.params, state.batch_stats, state.grid,
                jnp.asarray(o.microphone_poses, jnp.float32),
                jnp.asarray(o.source_poses, jnp.float32),
                jnp.asarray(o.rotations, jnp.float32))
            for i in range(log_pred.shape[0]):
                np.save(out_dir / f"stft_eval_{i:05d}.npy", np.asarray(log_pred[i]))

            # eval-view PNGs (the reference saves these during its full sweep,
            # NeRAF_pipeline.py:329-338)
            if bundle.vision_eval is not None and len(bundle.vision_eval.cameras):
                from PIL import Image

                cams = camera_arrays(bundle.vision_eval.cameras)
                H, W = (bundle.vision_eval.cameras.height,
                        bundle.vision_eval.cameras.width)
                for i in range(len(bundle.vision_eval.cameras)):
                    out = pipe.render_image(state, cams, i, H, W)
                    rgb = (np.clip(out["rgb"], 0, 1) * 255).astype(np.uint8)
                    Image.fromarray(rgb).save(out_dir / f"eval_img_{i:04d}.png")

    if args.output_path:
        trainer.write_eval_json(results, args.output_path)
    print(results)


if __name__ == "__main__":
    main()
