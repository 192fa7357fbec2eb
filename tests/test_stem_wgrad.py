"""Pallas stem weight-gradient kernel (ops/pallas/stem_wgrad_kernel.py):
interpret-mode parity against XLA's native conv wgrad, plus the dispatch
contract in ops/baked_stem.py (non-TPU backends must fall back to XLA).

Reference role: the stem conv is the folded form of the reference's
ResNet3D conv1 (NeRAF_resnet3d.py k5/s2 stem); its weight gradient is the
hottest op of the joint train step (docs/STEP_PROFILE.md round 5).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neraf_tpu.ops.pallas.stem_wgrad_kernel import (
    stem_wgrad_available,
    stem_wgrad_pallas,
)


def _xla_wgrad(x, g, c, f):
    def conv(w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), ((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    w0 = jnp.zeros((3, 3, 3, c, f), x.dtype)
    _, vjp = jax.vjp(conv, w0)
    return vjp(g)[0]


@pytest.mark.parametrize("dtype,block_d", [(jnp.float32, 4),
                                           (jnp.bfloat16, 2)])
def test_pallas_wgrad_matches_xla_interpret(dtype, block_d):
    rng = np.random.RandomState(0)
    c, f = 6, 5
    x = jnp.asarray(rng.randn(1, 8, 8, 8, c), dtype)
    g = jnp.asarray(rng.randn(1, 8, 8, 8, f), dtype)
    ref = _xla_wgrad(x, g, c, f).astype(jnp.float32)
    out = stem_wgrad_pallas(x, g, block_d=block_d, interpret=True)
    assert out.dtype == jnp.float32
    tol = 1e-4 if dtype == jnp.float32 else 2e-2  # accumulation-order noise
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=tol, atol=tol)


def test_pallas_wgrad_asymmetric_dims_interpret():
    """D != H != W and a kernel-visible asymmetric signal — catches any
    axis mix-up in the halo DMA or tap slicing."""
    rng = np.random.RandomState(1)
    c, f = 3, 4
    x = jnp.asarray(rng.randn(1, 4, 8, 16, c), jnp.float32)
    g = jnp.asarray(rng.randn(1, 4, 8, 16, f), jnp.float32)
    ref = _xla_wgrad(x, g, c, f)
    out = stem_wgrad_pallas(x, g, block_d=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_available_false_off_tpu():
    """CPU backend: the AOT probe must refuse, so baked_stem's dispatch
    stays on XLA's native wgrad (the path every CPU test exercises)."""
    if jax.default_backend() == "tpu":
        pytest.skip("probe is backend-dependent; this asserts the CPU leg")
    assert not stem_wgrad_available(8, 8, 8, 6, 5, 4, "float32")
