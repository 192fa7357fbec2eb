"""Input encodings: NeRF sinusoidal PE and degree-4 spherical harmonics.

TPU-native replacements for nerfstudio's NeRFEncoding and the tinycudann
SHEncoding used by the reference (NeRAF_model.py:158-167). Pure jnp functions
of static shape — XLA fuses them into the downstream matmuls, so there is
nothing to gain from a hand-written kernel here.
"""

from __future__ import annotations

import jax.numpy as jnp

SH_DIM = 16  # degree-4 spherical harmonics (levels=4 -> 16 coefficients)


def nerf_encoding_dim(in_dim: int, num_frequencies: int = 10, include_input: bool = True) -> int:
    return in_dim * (2 * num_frequencies + (1 if include_input else 0))


def nerf_encoding(
    x: jnp.ndarray,
    num_frequencies: int = 10,
    min_freq_exp: float = 0.0,
    max_freq_exp: float = 8.0,
    include_input: bool = True,
) -> jnp.ndarray:
    """Sinusoidal positional encoding matching nerfstudio's NeRFEncoding.

    freqs = 2**linspace(min, max, num); features = sin(2*pi*x*f) then
    cos(2*pi*x*f) (as sin(theta + pi/2)), input appended last.

    Args:
        x: (..., D) inputs (positions normalized to [0,1] upstream).
    Returns:
        (..., 2*D*num_frequencies [+ D]) encoding.
    """
    freqs = 2.0 ** jnp.linspace(min_freq_exp, max_freq_exp, num_frequencies)
    scaled = 2.0 * jnp.pi * x
    ang = scaled[..., None] * freqs  # (..., D, F)
    ang = ang.reshape(*x.shape[:-1], -1)  # (..., D*F)
    enc = jnp.sin(jnp.concatenate([ang, ang + jnp.pi / 2.0], axis=-1))
    if include_input:
        enc = jnp.concatenate([enc, x], axis=-1)
    return enc


def sh_encoding(d: jnp.ndarray) -> jnp.ndarray:
    """Degree-4 spherical harmonics basis, tcnn-compatible.

    tcnn's SphericalHarmonics maps its [0,1] input to [-1,1] internally;
    the reference feeds direction cosines normalized as (v+1)/2
    (NeRAF_dataparser.py:392-393), so we apply the same 2x-1 remap here.

    Args:
        d: (..., 3) values in [0,1].
    Returns:
        (..., 16) SH coefficients.
    """
    v = d * 2.0 - 1.0
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    x2, y2, z2 = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z

    out = [
        jnp.full_like(x, 0.28209479177387814),
        -0.48860251190291987 * y,
        0.48860251190291987 * z,
        -0.48860251190291987 * x,
        1.0925484305920792 * xy,
        -1.0925484305920792 * yz,
        0.94617469575755997 * z2 - 0.31539156525251999,
        -1.0925484305920792 * xz,
        0.54627421529603959 * x2 - 0.54627421529603959 * y2,
        0.59004358992664352 * y * (-3.0 * x2 + y2),
        2.8906114426405538 * xy * z,
        0.45704579946446572 * y * (1.0 - 5.0 * z2),
        0.3731763325901154 * z * (5.0 * z2 - 3.0),
        0.45704579946446572 * x * (1.0 - 5.0 * z2),
        1.4453057213202769 * z * (x2 - y2),
        0.59004358992664352 * x * (-x2 + 3.0 * y2),
    ]
    return jnp.stack(out, axis=-1)
