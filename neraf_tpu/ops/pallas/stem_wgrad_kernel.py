"""Pallas weight-gradient kernel for the folded stem conv (k3/s1/p1, batch 1).

The hottest op left in the joint train step after the round-5 relayout fixes
is the stem conv's weight gradient: XLA lowers the batch-1
dW = correlate(x, dout) over the 64^3 x 56ch folded volume ~11x off the MXU
roofline (2.98 ms/step, docs/profiles/profile_r5_after.json fusion.38 —
the round-4 shopping-list item SURVEY §3.1 / VERDICT r4 #1). The structural
fix is to read x and dout from HBM exactly ONCE and keep the 27-tap
accumulator resident in VMEM:

    dW[kd,kh,kw,ci,co] = sum_{d,h,w} x_pad[d+kd, h+kh, w+kw, ci] g[d,h,w,co]

Grid over depth blocks; per block one manual halo DMA brings the
(BD+2, H+2, W+2, C) x-slab into VMEM (BlockSpec tiles can't overlap, hence
the explicit async copy), the dout block arrives via the normal pipeline,
and each of the 27 taps is one MXU dot of (BD*H*W, C)^T @ (BD*H*W, F)
accumulated straight into the f32 output ref (constant index_map keeps it
VMEM-resident across the whole grid).

Used by ops/baked_stem.py's custom VJP when the backend supports it
(AOT-probe dispatch, same pattern as griffin_lim_kernel.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(bd: int, h: int, w: int):
    def kernel(xp_ref, g_ref, out_ref, x_buf, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            xp_ref.at[0, pl.ds(i * bd, bd + 2)], x_buf, sem)
        dma.start()

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        g = g_ref[0]  # (BD, H, W, F)
        gf = g.reshape(-1, g.shape[-1])
        dma.wait()
        c = x_buf.shape[-1]
        for kd in range(3):
            for kh in range(3):
                for kw in range(3):
                    xs = x_buf[kd:kd + bd, kh:kh + h, kw:kw + w, :]
                    xf = xs.reshape(-1, c)
                    out_ref[kd, kh, kw] += jax.lax.dot_general(
                        xf, gf, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

    return kernel


@partial(jax.jit, static_argnames=("block_d", "interpret"))
def stem_wgrad_pallas(x: jnp.ndarray, g: jnp.ndarray, block_d: int = 2,
                      interpret: bool = False) -> jnp.ndarray:
    """dW (3,3,3,C,F) f32 for conv3d(k3/s1/p1, NDHWC) at batch 1.

    Args:
        x: (1, D, H, W, C) conv input (any float dtype; contracted on MXU).
        g: (1, D, H, W, F) output cotangent.
        block_d: depth-block size (D % block_d == 0).
    """
    n, d, h, w, c = x.shape
    assert n == 1 and g.shape[:4] == x.shape[:4], (x.shape, g.shape)
    assert d % block_d == 0, (d, block_d)
    f = g.shape[-1]
    # The manually-DMA'd slab's tiled extents must be tile-aligned (Mosaic
    # memref_slice: sublane multiple of 8, lane multiple of 128), so pad
    # W+2 up to 8 and C up to 128. The extra W columns/C channels are zeros:
    # the taps only read [kw, kw+w) and zero channels contribute zero rows
    # to dW, sliced off below.
    w_pad = -(-(w + 2) // 8) * 8
    c_pad = -(-c // 128) * 128
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, w_pad - w - 1),
                     (0, c_pad - c)))

    out = pl.pallas_call(
        _make_kernel(block_d, h, w),
        out_shape=jax.ShapeDtypeStruct((3, 3, 3, c_pad, f), jnp.float32),
        grid=(d // block_d,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x_pad: manual halo DMA
            pl.BlockSpec((1, block_d, h, w, f),
                         lambda i: (0, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 3, 3, c_pad, f), lambda i: (0, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_d + 2, h + 2, w_pad, c_pad), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, g)
    return out[:, :, :, :c, :]


@lru_cache(maxsize=None)
def stem_wgrad_available(d: int, h: int, w: int, c: int, f: int,
                         block_d: int, dtype_name: str) -> bool:
    """True iff the kernel COMPILES on the current backend for this geometry
    (AOT lowering probe — no execution). Cached per shape; a backend
    regression or fix flips dispatch automatically."""
    import numpy as np

    if jax.default_backend() != "tpu":
        return False
    try:
        dtype = jnp.dtype(dtype_name)
        x = jax.ShapeDtypeStruct((1, d, h, w, c), dtype)
        g = jax.ShapeDtypeStruct((1, d, h, w, f), dtype)
        jax.jit(partial(stem_wgrad_pallas, block_d=block_d)).lower(
            x, g).compile()
        return True
    except Exception:
        return False
