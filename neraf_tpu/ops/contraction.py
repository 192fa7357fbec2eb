"""Scene contraction for unbounded scenes (mip-NeRF-360 style, inf-norm).

Matches nerfstudio's SceneContraction(order=inf) used by Nerfacto and handed
to the audio model by the reference pipeline (NeRAF_pipeline.py:143):

    contract(x) = x                          if ||x||_inf <= 1
                = (2 - 1/||x||_inf) * x/||x||_inf   otherwise

mapping R^3 into the ball of radius 2. Field queries then normalize to [0,1]
via (x + 2) / 4 before hash encoding.
"""

from __future__ import annotations

import jax.numpy as jnp


def scene_contraction(x: jnp.ndarray) -> jnp.ndarray:
    """Apply the inf-norm scene contraction to (..., 3) positions."""
    mag = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    mag = jnp.maximum(mag, 1e-10)
    contracted = (2.0 - 1.0 / mag) * (x / mag)
    return jnp.where(mag <= 1.0, x, contracted)


def contract_to_unit(x: jnp.ndarray) -> jnp.ndarray:
    """Contract then map the radius-2 ball into the unit cube [0,1]^3."""
    return (scene_contraction(x) + 2.0) / 4.0


def normalize_aabb(x: jnp.ndarray, aabb: jnp.ndarray) -> jnp.ndarray:
    """SceneBox.get_normalized_positions: AABB -> [0,1]^3 (no zeroing)."""
    return (x - aabb[0]) / (aabb[1] - aabb[0])
