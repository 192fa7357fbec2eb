"""Joint-pipeline training with encoding=hash + bwd_chunk/grad-mode sweep.

VERDICT r3 #4: the hash config path exists but the JOINT pipeline had never
been executed with encoding=hash, and the single-field 0.9 steps/s left an
unmeasured bwd_chunk / grad-mode table. This script:

  1. builds the PRODUCTION joint pipeline (grid 128^3, resnet50, 4096 rays,
     2048 STFT slices) with the vision field on the hash encoding and runs
     N per-step-dispatch train steps (the backend constraint: scan-wrapped
     hash training crashes the worker, docs/HASH_PERF.md round-3 notes),
     reporting compile time and steps/s;
  2. optionally sweeps bwd_chunk x grad_mode on the same step.

Run:  python scripts/hash_joint_bench.py [--steps 30] [--sweep]
      [--layout L8F4|L4F8] [--append-doc]

bwd_chunk reaches the kernel via NERAF_HASH_BWD_CHUNK (read at trace time);
each sweep cell re-execs this script in a child so the env var and the jit
caches are fresh.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_one(steps: int, layout: str, grad_mode: str) -> dict:
    import jax
    import jax.numpy as jnp

    from neraf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from __graft_entry__ import _build_pipeline

    pipe = _build_pipeline(grid_res=128, tiny=False)
    # switch the vision main field to the hash encoding (proposals stay
    # fourier per HASH_PERF design note #3) and rebuild the vision model
    from neraf_tpu.models.vision import VisionModel

    vcfg = pipe.config.vision_model
    vcfg.encoding = "hash"
    vcfg.hash_grad_mode = grad_mode
    if layout == "L4F8":
        vcfg.num_levels, vcfg.features_per_level = 4, 8
    else:
        vcfg.num_levels, vcfg.features_per_level = 8, 4
    pipe.vision_model = VisionModel(
        config=vcfg, num_cameras=8, near=0.05, far=1000.0,
        compute_dtype=pipe.vision_model.compute_dtype)
    pipe.__post_init__()  # re-jit the step functions against the new model

    state = pipe.init_state(seed=0)
    state = state._replace(step=jnp.int32(3000))  # audio branch active

    key = jax.random.PRNGKey(0)
    from scripts.profile_joint_step import build_step_inputs

    cam_arrays, audio_arrays, image_arrays = build_step_inputs(key)

    read = lambda m: float(np.asarray(m["total_loss"]))
    t0 = time.perf_counter()
    state, met = pipe.train_step(state, cam_arrays, audio_arrays,
                                 image_arrays)
    loss0 = read(met)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(steps):
        state, met = pipe.train_step(state, cam_arrays, audio_arrays,
                                     image_arrays)
    loss_n = read(met)
    dt = time.perf_counter() - t0
    return {
        "layout": layout, "grad_mode": grad_mode,
        "bwd_chunk": int(os.environ.get("NERAF_HASH_BWD_CHUNK", 2 ** 21)),
        "steps": steps, "compile_s": round(compile_s, 1),
        "steps_per_sec": round(steps / dt, 3),
        "loss_first": round(loss0, 5), "loss_last": round(loss_n, 5),
        "finite": bool(np.isfinite(loss_n)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--layout", default="L8F4", choices=["L8F4", "L4F8"])
    ap.add_argument("--grad-mode", default="scatter_set",
                    choices=["scatter_set", "gather", "scatter"])
    ap.add_argument("--sweep", action="store_true",
                    help="sweep bwd_chunk {2^20,2^21,2^22} x grad_mode "
                         "{scatter_set,gather} in child processes")
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.child or not args.sweep:
        res = run_one(args.steps, args.layout, args.grad_mode)
        print("HASH_JOINT_RESULT " + json.dumps(res), flush=True)
        return

    results = []
    for chunk_log2 in (20, 21, 22):
        for gm in ("scatter_set", "gather"):
            env = dict(os.environ,
                       NERAF_HASH_BWD_CHUNK=str(1 << chunk_log2))
            cmd = [sys.executable, __file__, "--child",
                   "--steps", str(args.steps), "--layout", args.layout,
                   "--grad-mode", gm]
            print(f"--- bwd_chunk=2^{chunk_log2} grad_mode={gm}", flush=True)
            proc = subprocess.run(cmd, env=env, capture_output=True,
                                  text=True, timeout=3600)
            line = [l for l in proc.stdout.splitlines()
                    if l.startswith("HASH_JOINT_RESULT ")]
            if line:
                results.append(json.loads(line[0].split(" ", 1)[1]))
                print(line[0], flush=True)
            else:
                print(f"FAILED rc={proc.returncode}\n{proc.stderr[-1500:]}",
                      flush=True)
                results.append({"bwd_chunk": 1 << chunk_log2,
                                "grad_mode": gm, "failed": True})
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
