"""Minimized repro: Mosaic rejects vectorized dynamic indexing (hash gather).

The natural Pallas hash-grid kernel keeps a level's table VMEM-resident and
gathers rows by a vector of indices:

    def gather_kernel(idx_ref, tbl_ref, out_ref):
        out_ref[:] = tbl_ref[idx_ref[:]]      # <- rejected

Mosaic fails at lowering time with ``ValueError: Cannot do int indexing on
TPU`` (observed 2026-08-16, jax 0.8.x, v5e) — vectorized dynamic indexing
into a Ref is unsupported; only scalar `pl.ds(start, size)` slices are. A
per-element `fori_loop` of scalar dynamic slices compiles but is orders of
magnitude slower than the XLA gather, and one-hot matmul reformulations are
FLOP-prohibitive at hash-table sizes (see docs/HASH_PERF.md).

Until the backend gains vector gather, the production path is the fused XLA
gather in ops/hashgrid.py. tests/test_pallas_hash_canary.py asserts this
kernel still FAILS to build — when the backend fixes it, the canary breaks
and the kernel should be benchmarked against the XLA path.

Role in the reference stack: tinycudann's hash-grid CUDA kernel
(reference README.md:45, NeRAF_model.py:164-167 via Nerfacto's field).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TABLE_ROWS = 1 << 12
FEATURES = 4
TILE = 256


def _gather_kernel(idx_ref, tbl_ref, out_ref):
    out_ref[:] = tbl_ref[idx_ref[:]]


def pallas_vector_gather(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """The unsupported kernel. Raises at trace/lower time on current Mosaic."""
    return pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((idx.shape[0], FEATURES), table.dtype),
        grid=(idx.shape[0] // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TABLE_ROWS, FEATURES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, FEATURES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(idx, table)


def backend_supports_vector_gather() -> bool:
    """True once Mosaic can lower the vector-gather kernel (canary probe)."""
    table = jnp.zeros((TABLE_ROWS, FEATURES), jnp.float32)
    idx = jnp.zeros((TILE,), jnp.int32)
    try:
        jax.eval_shape(lambda t, i: pallas_vector_gather(t, i), table, idx)
        jax.jit(pallas_vector_gather).lower(table, idx)
        return True
    except Exception:
        return False
