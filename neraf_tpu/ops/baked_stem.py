"""Stem conv over the baked pre-folded grid with a slab-local input VJP.

In the joint train step the ResNet stem consumes the pre-folded grid volume
whose only LIVE gradient path is the freshly baked slab — 4096 of 2M cells,
one (1,1,B/2R,R/2,4C) plane in s2d space (models/grid.py::folded_slab); the
carried base is stop_gradient'ed (reference semantics, NeRAF_model.py:395-400).
XLA's autodiff can't see that: it materializes the FULL-volume conv input
gradient (a 64^3 x 56-channel transposed conv, 1.34 ms/step on v5e,
docs/profiles/profile_r5_after.json fusion.95) and then slices out the slab.

`stem_conv_baked` is the same forward conv with a custom VJP that computes
the input gradient ONLY for the slab: slice a (3, NH+2, W) halo window out
of the (zero-padded) output cotangent, transpose-conv it against the slab's
channel block of the kernel — ~1/32 of the full dgrad work at production
geometry. The weight gradient is unchanged (XLA's native wgrad on the full
volume); the base volume's cotangent is zero by construction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_DIMS = ("NDHWC", "DHWIO", "NDHWC")


def _conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding=((1, 1),) * 3,
        dimension_numbers=_DIMS)


@partial(jax.custom_vjp, nondiff_argnums=(6,))
def stem_conv_baked(nf, slab, d0, h0, ch_off, wp, allow_pallas=True):
    """conv3d(k3/s1/p1) of the baked folded volume, slab-local input grad.

    Args:
        nf: (1, D, H, W, C8) folded volume WITH the slab's values already
            spliced in (bake_cells_folded output) — treated as constant.
        slab: (1, 1, NH, W, C4) the live slab (folded_slab output); its
            VALUES are already inside nf — this argument exists purely to
            carry the gradient path.
        d0, h0, ch_off: traced int32 slab placement (depth plane, first row,
            channel offset) in folded coordinates.
        wp: (3, 3, 3, C8, F) folded stem kernel.
        allow_pallas: static; permit the Pallas weight-gradient kernel when
            the backend compiles it (off under a device mesh — GSPMD cannot
            partition the pallas_call, and off on non-TPU backends).
    Returns:
        (1, D, H, W, F) conv output, numerically identical to `_conv(nf, wp)`.
    """
    del slab, d0, h0, ch_off
    return _conv(nf, wp)


def _fwd(nf, slab, d0, h0, ch_off, wp, allow_pallas):
    # (nondiff args reach fwd in their ORIGINAL positions; only bwd gets
    # them as leading arguments)
    return _conv(nf, wp), (nf, slab.shape, d0, h0, ch_off, wp)


def _pick_block_d(d: int) -> int:
    for bd in (8, 4, 2):
        if d % bd == 0:
            return bd
    return 1


def _bwd(allow_pallas, res, dout):
    nf, slab_shape, d0, h0, ch_off, wp = res
    _, _, nh, w_sp, c4 = slab_shape
    f = wp.shape[-1]

    # weight grad: ONE HBM pass over x and dout with the 27-tap accumulator
    # VMEM-resident (ops/pallas/stem_wgrad_kernel.py) when the backend
    # compiles it; XLA's native wgrad otherwise.
    d_wp = None
    if allow_pallas:
        from neraf_tpu.ops.pallas.stem_wgrad_kernel import (
            stem_wgrad_available,
            stem_wgrad_pallas,
        )

        _, dd, hh, ww, cc = nf.shape
        bd = _pick_block_d(dd)
        if stem_wgrad_available(dd, hh, ww, cc, f, bd, str(nf.dtype)):
            d_wp = stem_wgrad_pallas(nf, dout, block_d=bd).astype(wp.dtype)
    if d_wp is None:
        _, wgrad_fn = jax.vjp(lambda w: _conv(nf, w), wp)
        (d_wp,) = wgrad_fn(dout)

    # slab grad: d_in[t] = sum_k dout[t+1-k] w[k] restricted to the slab ->
    # VALID conv of a (3, NH+2, W) halo'd cotangent window against the
    # spatially-flipped, IO-transposed channel block of the kernel.
    dp = jnp.pad(dout, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    window = jax.lax.dynamic_slice(
        dp, (jnp.int32(0), d0, h0, jnp.int32(0), jnp.int32(0)),
        (1, 3, nh + 2, w_sp, f))
    w_blk = jax.lax.dynamic_slice(
        wp, (jnp.int32(0), jnp.int32(0), jnp.int32(0), ch_off, jnp.int32(0)),
        (3, 3, 3, c4, f))
    w_t = jnp.flip(w_blk, (0, 1, 2)).swapaxes(3, 4)  # (3,3,3,F,C4)
    d_slab = jax.lax.conv_general_dilated(
        window, w_t, window_strides=(1, 1, 1),
        padding=((0, 0), (0, 0), (1, 1)), dimension_numbers=_DIMS)

    zero_i = np.zeros((), jax.dtypes.float0)
    return (jnp.zeros_like(nf), d_slab, zero_i, zero_i, zero_i, d_wp)


stem_conv_baked.defvjp(_fwd, _bwd)
