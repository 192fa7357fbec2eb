"""Quick wall-clock timing of the production joint train step (no trace).

Same inputs/doctrine as bench.py bench_train_step: K back-to-back
dispatches, one forced host read of the final metric. Use between
optimization iterations when the full xplane profile isn't needed.

Run: python scripts/time_joint_step.py [--iters 30]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from neraf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from __graft_entry__ import _build_pipeline
    from scripts.profile_joint_step import build_step_inputs

    t0 = time.perf_counter()
    pipe = _build_pipeline(grid_res=128, tiny=False)
    state = pipe.init_state(seed=0)
    state = state._replace(step=jnp.int32(3000))
    cam_arrays, audio_arrays, image_arrays = build_step_inputs(
        jax.random.PRNGKey(0))
    print(f"build+init: {time.perf_counter() - t0:.1f} s", flush=True)

    read = lambda m: float(np.asarray(m["total_loss"]))
    t0 = time.perf_counter()
    state, met = pipe.train_step(state, cam_arrays, audio_arrays,
                                 image_arrays)
    read(met)
    print(f"compile+first step: {time.perf_counter() - t0:.1f} s", flush=True)

    for trial in range(3):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, met = pipe.train_step(state, cam_arrays, audio_arrays,
                                         image_arrays)
        read(met)
        wall = time.perf_counter() - t0
        print(f"trial {trial}: {1e3 * wall / args.iters:.2f} ms/step "
              f"({args.iters / wall:.2f} steps/s)", flush=True)


if __name__ == "__main__":
    main()
