"""Hash-grid TRAINING longevity + perf canary for the table-gradient modes.

Round-2 finding (docs/HASH_PERF.md:67-92): the XLA scatter-add backward of
the fused hash gather crashes the axon TPU worker after ~100 cumulative
executions, killing hash training on that backend. This script measures, at
REAL training load (4096 rays x 48 samples = 196k queries, L8xF4, 2^19
tables), whether each replacement strategy (ops/hashgrid.py gather_rows):

  scatter_set — sort + cumsum run totals + unique-index overwrite scatter
  gather      — fully scatter-free (searchsorted segment boundaries)

(1) survives thousands of training steps, and (2) what it costs per step.

Usage:
    python scripts/hash_backward_canary.py --modes scatter_set gather \
        --steps 2000 --chunk 100 [--queries 196608]

Prints one JSON line per mode: {"mode", "steps_done", "ok", "ms_per_step"}.
A worker crash surfaces as a RuntimeError/XlaRuntimeError after ~5 min;
it is caught and reported with ok=false.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from neraf_tpu.ops.hashgrid import HashGridSpec, hash_encoding, init_hash_table


def run_mode(mode: str, steps: int, chunk: int, n_queries: int,
             spec_base: HashGridSpec) -> dict:
    spec = dataclasses.replace(spec_base, grad_mode=mode)
    key = jax.random.PRNGKey(0)
    table = init_hash_table(key, spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (n_queries, 3))

    @jax.jit
    def scan_chunk(table, x):
        def body(tbl, _):
            def loss(t):
                return jnp.sum(hash_encoding(t, x, spec) ** 2)

            g = jax.grad(loss)(tbl)
            return tbl - 1e-3 * g, jnp.float32(0)

        tbl, _ = jax.lax.scan(body, table, None, length=chunk)
        return tbl

    out = {"mode": mode, "steps_done": 0, "ok": False, "ms_per_step": None}
    try:
        t_compile = time.perf_counter()
        table = scan_chunk(table, x)
        float(np.asarray(table[0, 0, 0]))  # force host read (tunnel-safe)
        out["compile_plus_first_chunk_s"] = round(
            time.perf_counter() - t_compile, 2)
        out["steps_done"] = chunk

        t0 = time.perf_counter()
        timed_chunks = 0
        while out["steps_done"] < steps:
            table = scan_chunk(table, x)
            float(np.asarray(table[0, 0, 0]))
            out["steps_done"] += chunk
            timed_chunks += 1
            print(json.dumps({"mode": mode, "progress": out["steps_done"],
                              "ms_per_step_so_far": round(
                                  (time.perf_counter() - t0)
                                  / (timed_chunks * chunk) * 1e3, 2)}),
                  flush=True)
        if timed_chunks:
            out["ms_per_step"] = round(
                (time.perf_counter() - t0) / (timed_chunks * chunk) * 1e3, 2)
        out["ok"] = True
    except Exception as e:  # worker crash / backend fault
        out["error"] = f"{type(e).__name__}: {str(e)[:500]}"
    return out


def main():
    # remote-compiler latency dominates (measured 384 s to compile the
    # sort-based backward at q=4096); persist compiles across runs
    from neraf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", nargs="+",
                    default=["gather", "scatter_set"])
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--queries", type=int, default=196608)
    ap.add_argument("--levels", type=int, default=8)
    ap.add_argument("--features", type=int, default=4)
    ap.add_argument("--log2-table", type=int, default=19)
    args = ap.parse_args()

    spec = HashGridSpec(num_levels=args.levels,
                        features_per_level=args.features,
                        log2_hashmap_size=args.log2_table,
                        base_res=16, max_res=2048)
    print(json.dumps({"device": str(jax.devices()[0]),
                      "queries": args.queries,
                      "rows_per_encoding": args.queries * 8 * args.levels}),
          flush=True)
    for mode in args.modes:
        print(json.dumps(run_mode(mode, args.steps, args.chunk,
                                  args.queries, spec)), flush=True)


if __name__ == "__main__":
    main()
