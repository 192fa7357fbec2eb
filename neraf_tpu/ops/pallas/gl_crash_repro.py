"""Minimized repro: Mosaic crash on concat of row-shifted VALUE slices.

Round 1's fused Griffin-Lim kernel (griffin_lim_kernel.py) failed to compile
on the v5e remote-compile backend: the Mosaic compiler subprocess died with
an opaque ``HTTP 500: tpu_compile_helper subprocess exit code 1``. Probing
the kernel's structural elements one by one isolated the trigger to exactly
this construct (observed 2026-08-16, jax 0.8.x, v5e):

    x = x_ref[:]                      # load the block as a VALUE
    jnp.concatenate([x[:, 0:T, :],    # two slices of it, row-shifted
                     x[:, 1:1+T, :]], axis=-1)   # <- compiler crash

while each of these compiles fine:
  - a single shifted value slice (no concat);
  - concat of UNshifted value slices;
  - concat of the same shifted slices read directly from the Ref
    (``x_ref[:, 0:T, :]``) — but only while the lane dim is <= 128: at
    hop=256 (the RAF geometry) the ref-slice concat crashes too;
  - row-shifted strip copies Ref->Ref (``fr[:, :, c*hop:(c+1)*hop] =
    pad_ref[:, c:c+T, :]``) at ANY hop — the workaround the GL kernel now
    uses (stage the padded signal in a VMEM scratch, copy shifted strips
    into a frames scratch, read the frames back whole; no concat).

`backend_crashes_on_shifted_value_concat()` is the canary probe: it returns
True while the backend still crashes. tests/test_pallas_gl.py pins the
current state on TPU runs — if the backend is fixed, the canary test fails
loudly, signalling the scratch-staging workaround in griffin_lim_kernel.py
can be simplified back to the direct concat.

Role in the reference stack: torchaudio's GriffinLim C++ kernel
(reference NeRAF_model.py:139).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

M, ROWS, T, HOP = 8, 19, 16, 128


def _crash_kernel(x_ref, o_ref):
    x = x_ref[:]  # (M, ROWS, HOP) value
    o_ref[:] = jnp.concatenate([x[:, 0:T, :], x[:, 1 : 1 + T, :]], axis=-1)


def shifted_value_concat(x: jnp.ndarray) -> jnp.ndarray:
    """The minimal crashing pallas_call (correct under interpret mode)."""
    return pl.pallas_call(
        _crash_kernel,
        out_shape=jax.ShapeDtypeStruct((M, T, 2 * HOP), jnp.float32),
    )(x)


def backend_crashes_on_shifted_value_concat() -> bool:
    """Canary probe: True while the Mosaic backend still crashes on it."""
    x = jax.ShapeDtypeStruct((M, ROWS, HOP), jnp.float32)
    try:
        jax.jit(shifted_value_concat).lower(x).compile()
        return False
    except Exception:
        return True
