"""conv3d_mm_wgrad: forward identical to lax.conv, grads pinned vs autodiff."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neraf_tpu.ops.conv3d import conv3d_mm_wgrad


def _ref_conv(x, w, stride, padding):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,) * 3,
        padding=((padding, padding),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@pytest.mark.parametrize("k,stride,padding,shape,cin,cout", [
    (3, 1, 1, (1, 8, 8, 8), 6, 16),    # residual 3^3 conv
    (3, 2, 1, (1, 8, 8, 8), 6, 16),    # strided stage-entry 3^3 conv
    (1, 1, 0, (1, 6, 6, 6), 8, 12),    # bottleneck 1^3 conv
    (1, 2, 0, (1, 8, 8, 8), 8, 12),    # strided 1^3 downsample conv
    (3, 1, 1, (2, 5, 5, 5), 4, 8),     # batch > 1 still exact
    (5, 2, 2, (1, 10, 10, 10), 7, 8),  # direct k5/s2 stem shape
])
def test_conv3d_mm_wgrad_matches_autodiff(k, stride, padding, shape, cin, cout):
    kx, kw, kd = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (*shape, cin), jnp.float32)
    w = jax.random.normal(kw, (k, k, k, cin, cout), jnp.float32) * 0.1

    y = conv3d_mm_wgrad(x, w, stride, padding)
    y_ref = _ref_conv(x, w, stride, padding)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))

    dy = jax.random.normal(kd, y.shape, jnp.float32)

    def loss(f):
        return lambda xx, ww: jnp.sum(f(xx, ww) * dy)

    gx, gw = jax.grad(loss(lambda xx, ww: conv3d_mm_wgrad(
        xx, ww, stride, padding)), argnums=(0, 1))(x, w)
    gx_ref, gw_ref = jax.grad(loss(lambda xx, ww: _ref_conv(
        xx, ww, stride, padding)), argnums=(0, 1))(x, w)

    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=1e-5, atol=1e-5)


def test_conv3d_mm_wgrad_bf16_accumulates_fp32():
    """bf16 inputs: the tap matmuls accumulate in fp32 (preferred_element_type),
    so dW stays close to the fp32 reference."""
    kx, kw, kd = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(kx, (1, 8, 8, 8, 8), jnp.float32)
    w = jax.random.normal(kw, (3, 3, 3, 8, 16), jnp.float32) * 0.1
    dy = jax.random.normal(kd, (1, 8, 8, 8, 16), jnp.float32)

    def wgrad(f, xx, ww, dtype):
        return jax.grad(lambda w_: jnp.sum(
            f(xx.astype(dtype), w_.astype(dtype), 1, 1).astype(jnp.float32)
            * dy))(ww)

    gw_ref = wgrad(lambda a, b, s, p: jax.lax.conv_general_dilated(
        a, b, (s,) * 3, ((p, p),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")), x, w, jnp.float32)
    gw_bf16 = wgrad(conv3d_mm_wgrad, x, w, jnp.bfloat16)
    # bf16 rounding of inputs only — fp32 accumulation keeps the norm-wise
    # error at input-rounding scale (elementwise relative error is
    # meaningless on near-zero gradient entries)
    ref = np.asarray(gw_ref)
    err = np.linalg.norm(np.asarray(gw_bf16, np.float32) - ref)
    assert err / np.linalg.norm(ref) < 1e-2
