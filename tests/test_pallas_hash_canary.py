"""Canary: Mosaic vector-gather support (hash-grid Pallas kernel gate).

The Pallas hash-gather kernel is blocked on Mosaic's lack of vectorized
dynamic indexing (ops/pallas/hash_gather_attempt.py). This test pins the
CURRENT state: the kernel must fail to lower, and the interpret-mode
semantics must match the XLA gather (so the kernel is correct the day the
backend accepts it). If the support canary flips, this test fails loudly —
that is the signal to benchmark and enable the Pallas path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neraf_tpu.ops.pallas import hash_gather_attempt as H


def test_backend_still_lacks_vector_gather():
    if H.backend_supports_vector_gather():
        pytest.fail(
            "Mosaic now supports vectorized dynamic indexing! Benchmark "
            "pallas_vector_gather vs the XLA gather in ops/hashgrid.py and "
            "enable the Pallas path (see docs/HASH_PERF.md).")


def test_kernel_semantics_in_interpret_mode():
    """The kernel itself is correct — verified interpreted."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (H.TABLE_ROWS, H.FEATURES))
    idx = jax.random.randint(key, (H.TILE * 4,), 0, H.TABLE_ROWS)

    out = pl.pallas_call(
        H._gather_kernel,
        out_shape=jax.ShapeDtypeStruct((idx.shape[0], H.FEATURES), table.dtype),
        grid=(idx.shape[0] // H.TILE,),
        in_specs=[
            pl.BlockSpec((H.TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((H.TABLE_ROWS, H.FEATURES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((H.TILE, H.FEATURES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=True,
    )(idx, table)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table[idx]))
