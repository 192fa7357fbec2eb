"""3D convolution with a matmul-formulated weight gradient (custom VJP).

Why this exists (docs/STEP_PROFILE.md): the joint train step runs a
50-layer 3D ResNet on ONE 128^3 example every step (reference
NeRAF_model.py:553-560 — batch-1 by construction). XLA lowers batch-1
conv3d *weight gradients* as halo-chunked convolution passes whose
contracted dimension is the tiny batch/window — far from MXU
speed-of-light (profiled: the k5 stem wgrad alone cost 17.9 ms of a 73 ms
step before the space-to-depth rewrite; the residual 3^3 wgrads are the
remaining long tail).

The fix: for a batch-1 conv the weight gradient factors EXACTLY into
k^3 plain matrix products, one per kernel tap:

    dW[a,b,c,ci,co] = sum_p xp[s*p + (a,b,c), ci] * dy[p, co]

i.e. dW[tap] = X_tap^T @ dY where X_tap is a strided slice of the padded
input flattened over output positions (contraction dim = OD*OH*OW, in the
tens of thousands) — ideal MXU shapes with fp32 accumulation. The data
gradient keeps XLA's native transposed-conv path (its contraction runs
over the large channel dim and is already efficient).

Forward results are bit-identical to lax.conv_general_dilated (it IS the
forward); gradients are pinned against jax autodiff in
tests/test_conv3d.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _conv_fwd(x, w, stride, padding):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,) * 3,
        padding=((padding, padding),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3d_mm_wgrad(x, w, stride=1, padding=1):
    """NDHWC x DHWIO -> NDHWC conv; backward computes dW as tap matmuls.

    Args:
        x: (N, D, H, W, Cin) input (any float dtype; N must be small — the
           wgrad contracts N into the spatial dim).
        w: (k, k, k, Cin, Cout) kernel.
        stride: isotropic window stride.
        padding: isotropic symmetric spatial padding.
    """
    return _conv_fwd(x, w, stride, padding)


def _fwd_rule(x, w, stride, padding):
    return _conv_fwd(x, w, stride, padding), (x, w)


def _bwd_rule(stride, padding, res, dy):
    x, w = res
    k = w.shape[0]

    # dx: XLA's native transposed-conv (contraction over Cout — efficient).
    # jax.vjp over a closure in x re-derives exactly that path.
    _, vjp_x = jax.vjp(lambda xx: _conv_fwd(xx, w, stride, padding), x)
    (dx,) = vjp_x(dy)

    # dW: one (Cin, P) x (P, Cout) matmul per kernel tap, fp32 accumulation.
    n, od, oh, ow, cout = dy.shape
    cin = x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding),
                     (padding, padding), (0, 0)))
    dy2 = dy.reshape(-1, cout)
    taps = []
    for a in range(k):
        for b in range(k):
            for c in range(k):
                xs = jax.lax.slice(
                    xp,
                    (0, a, b, c, 0),
                    (n, a + stride * (od - 1) + 1, b + stride * (oh - 1) + 1,
                     c + stride * (ow - 1) + 1, cin),
                    (1, stride, stride, stride, 1))
                x2 = xs.reshape(-1, cin)
                taps.append(jax.lax.dot_general(
                    x2, dy2, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
    dw = jnp.stack(taps).reshape(k, k, k, cin, cout).astype(w.dtype)
    return dx, dw


conv3d_mm_wgrad.defvjp(_fwd_rule, _bwd_rule)
