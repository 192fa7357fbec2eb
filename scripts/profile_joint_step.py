"""Trace-backed ms-by-ms accounting of the production joint train step.

VERDICT r3 #2: the 76.6 ms step contains only ~13 ms of accounted component
time (MFU 7.4%) — find the other 63 ms. This captures a jax.profiler xplane
trace of K back-to-back steps at production sizes on the real chip, parses
it with jax.profiler.ProfileData, and prints:

  - per-plane totals (TPU device time vs host time),
  - the top-N device ops/fusions by self time, aggregated by name,
  - the device-busy fraction of the wall-clock step (dispatch/tunnel gap).

Run:  python scripts/profile_joint_step.py [--iters 20] [--out /tmp/xplane]
The raw trace stays in --out for TensorBoard; the aggregation below is
self-contained (no tensorboard_plugin_profile needed).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def build_step_inputs(key):
    """Production-size inputs, identical to bench.py bench_train_step."""
    n_cams, H, W = 8, 512, 512
    cam_arrays = {
        "c2w": jnp.broadcast_to(
            jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1),
            (n_cams, 3, 4)),
        "fx": jnp.full((n_cams,), 400.0), "fy": jnp.full((n_cams,), 400.0),
        "cx": jnp.full((n_cams,), W / 2), "cy": jnp.full((n_cams,), H / 2),
    }
    image_arrays = {"images": jax.random.uniform(key, (n_cams, H, W, 3))}
    n_rec, F, T = 100, 257, 78
    audio_arrays = {
        "mic_pose": jax.random.uniform(key, (n_rec, 3)) * 4 - 2,
        "source_pose": jnp.zeros((n_rec, 3)),
        "rot": jnp.full((n_rec, 3), 0.5),
        "log_stft": jax.random.normal(key, (n_rec, 2, F, T)) * 0.5 - 3,
    }
    return cam_arrays, audio_arrays, image_arrays


def summarize_xplane(trace_dir: str | Path, top_n: int = 40,
                     per_line: bool = False) -> dict:
    """Aggregate device/host op self-times from the newest xplane file.

    per_line=True additionally keys the aggregation by (line name) — the
    device plane mixes the serialized compute line with overlapping async
    DMA lines, so a cross-line sum double-counts overlap; per-line totals
    are what a speed-of-light comparison needs.
    """
    from jax.profiler import ProfileData

    files = sorted(Path(trace_dir).rglob("*.xplane.pb"),
                   key=lambda p: p.stat().st_mtime)
    if not files:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    data = ProfileData.from_file(str(files[-1]))

    planes = {}
    for plane in data.planes:
        # per-plane: sum event durations by event name across all lines
        by_name = defaultdict(float)
        by_line = {}
        total = 0.0
        t_min, t_max = float("inf"), 0.0
        for line in plane.lines:
            line_agg = defaultdict(float)
            for ev in line.events:
                dur = ev.duration_ns / 1e6  # -> ms
                by_name[ev.name] += dur
                line_agg[ev.name] += dur
                total += dur
                t0 = ev.start_ns / 1e6
                t_min = min(t_min, t0)
                t_max = max(t_max, t0 + dur)
            if line_agg:
                key = line.name or f"line_{len(by_line)}"
                by_line[key] = {
                    "sum_ms": sum(line_agg.values()),
                    "top": sorted(line_agg.items(),
                                  key=lambda kv: -kv[1])[:top_n],
                }
        planes[plane.name] = {
            "sum_event_ms": total,
            "span_ms": (t_max - t_min) if t_max > 0 else 0.0,
            "top": sorted(by_name.items(), key=lambda kv: -kv[1])[:top_n],
        }
        if per_line:
            planes[plane.name]["lines"] = by_line
    return planes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", default="/tmp/neraf_xplane")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--json-out", default=None,
                    help="also dump the aggregation as JSON")
    args = ap.parse_args()

    from neraf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from __graft_entry__ import _build_pipeline

    pipe = _build_pipeline(grid_res=128, tiny=False)
    state = pipe.init_state(seed=0)
    state = state._replace(step=jnp.int32(3000))  # audio branch active

    key = jax.random.PRNGKey(0)
    cam_arrays, audio_arrays, image_arrays = build_step_inputs(key)

    read = lambda m: float(np.asarray(m["total_loss"]))
    # warm up / compile
    state, met = pipe.train_step(state, cam_arrays, audio_arrays,
                                 image_arrays)
    read(met)
    state, met = pipe.train_step(state, cam_arrays, audio_arrays,
                                 image_arrays)
    read(met)

    # timed + traced run
    from neraf_tpu.utils.profiling import trace

    t0 = time.perf_counter()
    with trace(args.out):
        for _ in range(args.iters):
            state, met = pipe.train_step(state, cam_arrays, audio_arrays,
                                         image_arrays)
        read(met)
    wall = time.perf_counter() - t0
    step_ms = 1e3 * wall / args.iters
    print(f"\nwall per step: {step_ms:.2f} ms ({args.iters} iters, "
          f"{1e3 / step_ms:.2f} steps/s)\n")

    planes = summarize_xplane(args.out, top_n=args.top, per_line=True)
    for name, p in planes.items():
        print(f"=== plane: {name} ===")
        print(f"  sum of event self-times: {p['sum_event_ms']:.1f} ms over "
              f"span {p['span_ms']:.1f} ms "
              f"(busy {100 * p['sum_event_ms'] / max(p['span_ms'], 1e-9):.1f}%"
              " — >100% means overlapping lines)")
        per_step = p["sum_event_ms"] / args.iters
        print(f"  per-step event time: {per_step:.2f} ms")
        for line_name, ln in p.get("lines", {}).items():
            print(f"  --- line: {line_name} "
                  f"({ln['sum_ms'] / args.iters:.2f} ms/step)")
            for ev_name, ms in ln["top"]:
                print(f"    {ms / args.iters:8.3f} ms/step  {ev_name[:110]}")
        print()

    if args.json_out:
        Path(args.json_out).write_text(json.dumps(
            {"step_ms": step_ms, "iters": args.iters,
             "planes": planes}, indent=1))
        print(f"json written to {args.json_out}")


if __name__ == "__main__":
    main()
