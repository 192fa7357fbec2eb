"""SO3xR3 camera-pose optimizer.

Rebuild of nerfstudio's CameraOptimizer(mode="SO3xR3") selected by the
reference config (NeRAF_config.py:97): a learned 6-DoF tangent-space
correction per training camera, applied to ray origins (translation) and
directions (rotation via the SO(3) exponential map).
"""

from __future__ import annotations

import jax.numpy as jnp


def init_camera_opt(num_cameras: int) -> jnp.ndarray:
    """Zero-initialized (N, 6) corrections: [omega (3), translation (3)]."""
    return jnp.zeros((num_cameras, 6), dtype=jnp.float32)


def exp_map_so3(omega: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: (..., 3) axis-angle -> (..., 3, 3) rotation.

    The norm is computed via a clamped sum-of-squares so the gradient at the
    zero-initialized correction is exactly 0 instead of NaN (d||w||/dw at 0).
    """
    sq = jnp.sum(omega * omega, axis=-1, keepdims=True)[..., None]  # (...,1,1)
    theta = jnp.sqrt(jnp.maximum(sq, 1e-16))
    w = omega
    K = jnp.stack([
        jnp.stack([jnp.zeros_like(w[..., 0]), -w[..., 2], w[..., 1]], axis=-1),
        jnp.stack([w[..., 2], jnp.zeros_like(w[..., 0]), -w[..., 0]], axis=-1),
        jnp.stack([-w[..., 1], w[..., 0], jnp.zeros_like(w[..., 0])], axis=-1),
    ], axis=-2)
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    theta_safe = jnp.maximum(theta, 1e-8)
    A = jnp.sin(theta_safe) / theta_safe
    B = (1.0 - jnp.cos(theta_safe)) / (theta_safe**2)
    R = eye + A * K + B * (K @ K)
    # small-angle: R ~= I + K
    return jnp.where(theta < 1e-7, eye + K, R)


def apply_camera_opt(cam_params: jnp.ndarray, camera_indices: jnp.ndarray,
                     origins: jnp.ndarray, directions: jnp.ndarray):
    """Apply per-camera corrections to a ray batch."""
    corr = cam_params[camera_indices]  # (B, 6)
    R = exp_map_so3(corr[..., :3])
    new_dirs = jnp.einsum("bij,bj->bi", R, directions)
    new_origins = origins + corr[..., 3:]
    return new_origins, new_dirs
