"""neraf-train: the ns-train NeRAF equivalent.

Usage:
    neraf-train [--dataset RAF|SoundSpaces] [--scene NAME] --data-root DIR
                [--max-iters N] [--load-dir CKPT_DIR] [--output-dir DIR]
                [--audio-only] [--num-devices N]

Env overrides (reference parity): NeRAF_dataset, NeRAF_scene.
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp

from neraf_tpu.configs.config import default_config
from neraf_tpu.data.vision_data import camera_arrays
from neraf_tpu.engine.factory import build_pipeline
from neraf_tpu.engine.trainer import Trainer
from neraf_tpu.viz.panels import save_eval_images


def parse_args(argv=None):
    p = argparse.ArgumentParser(prog="neraf-train")
    p.add_argument("--dataset", default=None, choices=["RAF", "SoundSpaces"])
    p.add_argument("--scene", default=None)
    p.add_argument("--data-root", required=True)
    p.add_argument("--max-iters", type=int, default=None)
    p.add_argument("--load-dir", default=None)
    p.add_argument("--output-dir", default=None)
    p.add_argument("--run-dir", default=None,
                   help="pin the EXACT run directory (skip the timestamped "
                        "subdir) — lets resume legs append to one run's "
                        "metrics.jsonl and checkpoint dir")
    p.add_argument("--audio-only", action="store_true",
                   help="train the grid-free acoustic field only")
    p.add_argument("--num-devices", type=int, default=None,
                   help="data-parallel mesh size (default: all devices)")
    p.add_argument("--viewer-port", type=int, default=None,
                   help="serve the HTTP viewer on this port during training "
                        "(renders track the latest train state)")
    p.add_argument("--streaming", default=None, choices=["on", "off", "auto"],
                   help="audio data path: whole split in HBM (off), "
                        "host-streamed batches (on), or size-based (auto; "
                        "see docs/DATA.md per-scene table)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="override any config field by dotted path (the "
                        "tyro-flag equivalent of ns-train's per-field "
                        "flags), e.g. --set vision_model.encoding=hash "
                        "--set trainer.start_step_audio=0; YAML-parsed "
                        "values; repeatable")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from neraf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = default_config(args.dataset, args.scene, data_root=args.data_root)
    cfg.seed = args.seed
    if args.output_dir:
        cfg.output_dir = args.output_dir
    if args.audio_only:
        cfg.audio_model.use_grid = False
    if args.streaming is not None:
        cfg.audio_data.streaming = args.streaming
    if args.overrides:
        # applied LAST so explicit --set values are final (default_config
        # already ran the per-dataset resolve derivations)
        from neraf_tpu.configs.config import apply_overrides

        apply_overrides(cfg, args.overrides)

    mesh = None
    if args.num_devices is not None and args.num_devices > 1:
        from neraf_tpu.parallel.sharding import make_mesh

        mesh = make_mesh(args.num_devices)

    if args.audio_only:
        from neraf_tpu.engine.audio_engine import AudioEngine
        from neraf_tpu.engine.factory import load_audio_split
        from neraf_tpu.models.audio import AudioModel

        audio_train = load_audio_split(cfg, "train")
        audio_eval = load_audio_split(cfg, "test")
        model = AudioModel(config=cfg.audio_model)
        engine = AudioEngine(config=cfg, model=model,
                             aabb=jnp.asarray(audio_train.outputs.aabb, jnp.float32))
        trainer = Trainer(config=cfg, pipeline=engine, output_dir=args.run_dir)
        state = engine.init_state()
        state, _ = trainer.maybe_resume(state, args.load_dir)

        from neraf_tpu.data.streaming import StreamingAudioSampler, should_stream

        if should_stream(cfg.audio_data, audio_train):
            sampler = StreamingAudioSampler(
                audio_train, cfg.audio_data.batch_size, seed=args.seed,
                transfer_dtype=cfg.audio_data.stream_transfer_dtype)
            step_fn = lambda s: engine.train_step(s, sampler.next())
        else:
            sampler = None
            arrays = audio_train.slice_arrays()
            step_fn = lambda s: engine.train_step(s, arrays)
        try:
            state = trainer.train(
                state,
                step_fn=step_fn,
                eval_fns={"eval_audio": lambda s: engine.evaluate(s, audio_eval)},
                max_steps=args.max_iters,
            )
        finally:
            if sampler is not None:
                sampler.stop()
        return

    bundle = build_pipeline(cfg, mesh=mesh)
    pipe = bundle.pipeline
    trainer = Trainer(config=cfg, pipeline=pipe, output_dir=args.run_dir)

    state = pipe.init_state()
    state, _ = trainer.maybe_resume(state, args.load_dir)

    cam_arrays = camera_arrays(bundle.vision_train.cameras)
    image_arrays = {"images": jnp.asarray(bundle.vision_train.images)}

    from neraf_tpu.data.streaming import StreamingAudioSampler, should_stream

    if should_stream(cfg.audio_data, bundle.audio_train):
        # apartment-scale splits: log-STFT stays in host memory, batches
        # stream with a double-buffered async device_put (data/streaming.py)
        audio_sampler = StreamingAudioSampler(
            bundle.audio_train, cfg.audio_data.batch_size, seed=args.seed,
            transfer_dtype=cfg.audio_data.stream_transfer_dtype)
        next_audio = audio_sampler.next
    else:
        audio_sampler = None
        audio_arrays = bundle.audio_train.slice_arrays()
        next_audio = lambda: audio_arrays

    eval_cam_arrays = camera_arrays(bundle.vision_eval.cameras)
    eval_image_arrays = {"images": jnp.asarray(bundle.vision_eval.images)}
    eval_fns = {
        "eval_vision": lambda s: pipe.evaluate_vision(
            s, eval_cam_arrays, bundle.vision_eval.images),
        # in-training cadence uses the ~14x-faster on-device sweep; the
        # final neraf-eval run uses the host evaluator (metric of record)
        "eval_audio": lambda s: pipe.evaluate_audio_device(s, bundle.audio_eval),
    }

    n_eval = len(bundle.vision_eval.cameras)
    n_eval_audio = len(bundle.audio_eval.outputs.audio_filenames)
    eval_img_dir = trainer.output_dir / "eval_images"

    def eval_image_fn(s, step):
        idx = (step // cfg.trainer.steps_per_eval_image - 1) % n_eval
        audio_item = None
        if n_eval_audio:
            a = bundle.audio_eval
            j = (step // cfg.trainer.steps_per_eval_image - 1) % n_eval_audio
            audio_item = {
                "mic_pose": a.outputs.microphone_poses[j],
                "source_pose": a.outputs.source_poses[j],
                "rot": a.outputs.rotations[j],
                "data": a.log_stft[j],
            }
        metrics, images = pipe.eval_image(s, eval_cam_arrays, idx,
                                          bundle.vision_eval.images[idx],
                                          eval_audio_item=audio_item)
        # persist the comparison panels like the reference's eval sweep does
        # (reference NeRAF_pipeline.py:329-338 saves PNGs per eval view)
        save_eval_images(images, eval_img_dir, step)
        return metrics

    on_metrics = None
    if args.viewer_port is not None:
        # live-training viewer (ns-viewer-during-train analogue): serve the
        # HTTP viewer in a daemon thread, refreshed on the metrics cadence.
        # Two hard constraints on this backend: (1) train_step donates its
        # input state, so the viewer must render from an undonated COPY —
        # the live state's buffers are deleted one step later; (2) the jax
        # client aborts on concurrent dispatch from a second host thread,
        # so handler threads marshal device work onto the training thread
        # via TrainThreadDispatcher, pumped on the metrics cadence.
        import jax as _jax

        from neraf_tpu.viz.viewer import (
            TrainThreadDispatcher,
            ViewerBackend,
            serve,
        )

        def snapshot(s):
            return _jax.tree_util.tree_map(lambda x: x.copy(), s)

        dispatcher = TrainThreadDispatcher()
        backend = ViewerBackend(pipe, snapshot(state), dispatch=dispatcher)
        serve(backend, port=args.viewer_port, blocking=False)
        print(f"viewer at http://127.0.0.1:{args.viewer_port}")

        def _refresh():
            # snapshot lazily: the on-device copy of the whole train state
            # (params + opt states + 128^3 grid) is only needed when a
            # viewer request is actually waiting — with no client connected
            # this cadence must not cost allocations on the hot path.
            # Passed as pump(before=...) so a request that arrives between
            # any pending() check and pump() still renders a FRESH snapshot
            # (never the stale — possibly step-0 — one).
            backend.state = snapshot(trainer._latest_state)

        def on_metrics(step, scalars):
            backend.step_hint = step
            dispatcher.pump(before=_refresh)

    try:
        state = trainer.train(
            state,
            step_fn=lambda s: pipe.train_step(s, cam_arrays, next_audio(),
                                              image_arrays),
            eval_fns=eval_fns,
            eval_batch_fn=lambda s: pipe.eval_loss_dict(
                s, eval_cam_arrays, next_audio(), eval_image_arrays),
            eval_image_fn=eval_image_fn,
            max_steps=args.max_iters,
            on_metrics=on_metrics,
        )
    finally:
        if audio_sampler is not None:
            audio_sampler.stop()


if __name__ == "__main__":
    main()
