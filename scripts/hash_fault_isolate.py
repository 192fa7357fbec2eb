"""Fault isolation for the hash-training worker crash at full load.

At the real training load (196,608 queries -> 12.6M gather rows), ALL three
table-gradient strategies -- scatter-add, overwrite-scatter (scatter_set),
and the zero-scatter 'gather' form -- crash the axon TPU worker inside the
first 100-step scan chunk. Since scatter_set and gather share only the sort
+ cumsum + dense accumulation skeleton, the fault must live in a shared
component. This script runs each component IN ISOLATION at the same scale,
one subprocess per case (a worker crash kills the client, ~5 min recovery),
and prints one JSON line per case.

Cases (all inside jit(lax.scan(length=n))):
  fwd_gather   12.6M-row table gather (the eval path -- expected OK)
  sort         argsort of 2^21 int32 keys (one backward chunk's sort)
  sort_payload argsort + payload gather (2^21, 4) fp32
  cumsum       cumsum over (2^21, 4) fp32
  searchsorted 4.2M boundaries into 2^21 sorted keys
  bwd_chunk    one full backward chunk (sort + cumsum + boundary gather)

Usage: python scripts/hash_fault_isolate.py [--cases ...] [--iters 100]
       python scripts/hash_fault_isolate.py --child <case> <iters>  (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# defaults = the real training load; overridable for CPU smoke tests
M_ROWS = int(os.environ.get("ISOLATE_M_ROWS", 12_582_912))  # 196,608 q x 64
CHUNK = int(os.environ.get("ISOLATE_CHUNK", 2 ** 21))
N_ROWS = int(os.environ.get("ISOLATE_N_ROWS", 8 * 2 ** 19))  # power of two
F = 4

CASES = ["fwd_gather", "sort", "sort_payload", "cumsum", "searchsorted",
         "bwd_chunk"]


def run_child(case: str, iters: int) -> None:
    sys.path.insert(0, str(REPO))
    import numpy as np

    import jax
    import jax.numpy as jnp

    from neraf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    key_i = jnp.asarray(rng.integers(0, N_ROWS, CHUNK), jnp.int32)
    vals = jnp.asarray(rng.standard_normal((CHUNK, F)), jnp.float32)
    table = jnp.asarray(rng.standard_normal((N_ROWS, F)), jnp.float32)
    big_i = jnp.asarray(rng.integers(0, N_ROWS, M_ROWS), jnp.int32)

    def body_for(case):
        if case == "fwd_gather":
            # xor-with-carry defeats loop-invariant hoisting (N_ROWS = 2^22)
            def b(c, _):
                i = (big_i ^ c.astype(jnp.int32)) & (N_ROWS - 1)
                return c + table[i].sum(), 0.0
            return b, jnp.float32(0)
        if case == "sort":
            return (lambda c, _: (c + jnp.argsort(key_i ^ c.astype(jnp.int32))
                                  .sum().astype(jnp.float32), 0.0),
                    jnp.float32(0))
        if case == "sort_payload":
            def b(c, _):
                order = jnp.argsort(key_i ^ c.astype(jnp.int32))
                return c + vals[order].sum(), 0.0
            return b, jnp.float32(0)
        if case == "cumsum":
            return (lambda c, _: (c + jnp.cumsum(vals + c, axis=0)[-1].sum(),
                                  0.0), jnp.float32(0))
        if case == "searchsorted":
            def b(c, _):
                sk = jnp.sort(key_i ^ c.astype(jnp.int32))
                bounds = jnp.searchsorted(
                    sk, jnp.arange(N_ROWS + 1, dtype=jnp.int32), side="left")
                return c + bounds[::1024].sum().astype(jnp.float32), 0.0
            return b, jnp.float32(0)
        if case == "bwd_chunk":
            from neraf_tpu.ops.hashgrid import _sorted_segment_grad

            def b(c, _):
                g = _sorted_segment_grad(key_i ^ c.astype(jnp.int32),
                                         vals, N_ROWS, "gather")
                return c + g.sum(), 0.0
            return b, jnp.float32(0)
        raise ValueError(case)

    body, init = body_for(case)

    @jax.jit
    def run(x):
        return jax.lax.scan(body, x, None, length=iters)[0]

    t0 = time.perf_counter()
    out = float(np.asarray(run(init)))
    wall = time.perf_counter() - t0
    # second dispatch: catches crashes triggered by cumulative executions
    t1 = time.perf_counter()
    out = float(np.asarray(run(jnp.float32(out % 7.0))))
    wall2 = time.perf_counter() - t1
    print(json.dumps({"case": case, "iters": iters, "ok": True,
                      "compile_plus_first_s": round(wall, 1),
                      "second_dispatch_s": round(wall2, 1)}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", nargs="+", default=CASES)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--child", nargs=2, metavar=("CASE", "ITERS"))
    ap.add_argument("--recovery-wait", type=int, default=300)
    args = ap.parse_args()

    if args.child:
        run_child(args.child[0], int(args.child[1]))
        return

    for case in args.cases:
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, __file__, "--child", case, str(args.iters)],
            capture_output=True, text=True, timeout=3600,
            cwd=str(REPO), env=dict(os.environ))
        sys.stdout.write(proc.stdout)
        if proc.returncode != 0:
            tail = (proc.stderr or "").strip().splitlines()
            print(json.dumps({
                "case": case, "iters": args.iters, "ok": False,
                "wall_s": round(time.time() - t0, 1),
                "error": tail[-1][:300] if tail else f"rc={proc.returncode}",
            }), flush=True)
            # a crash leaves the worker restarting; give it time
            time.sleep(args.recovery_wait)


if __name__ == "__main__":
    main()
