"""Image metrics: PSNR, SSIM (and an LPIPS hook).

Replaces the torchmetrics PSNR/SSIM/LPIPS used by the inherited Nerfacto
eval (invoked at reference NeRAF_pipeline.py:328). PSNR and SSIM are exact
ports of the standard definitions in pure JAX. LPIPS requires pretrained VGG
features; `lpips` returns NaN unless a weights file is supplied (the
environment has no network egress to fetch them), with the API in place for
parity when weights are available.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def psnr(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio over images in [0, max_val]."""
    mse = jnp.mean((pred - target) ** 2)
    return 20.0 * jnp.log10(max_val) - 10.0 * jnp.log10(mse)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


@functools.partial(jax.jit, static_argnames=("max_val",))
def ssim(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Structural similarity (standard Gaussian-window SSIM, matching
    torchmetrics' defaults: 11x11 window, sigma 1.5, k1=0.01, k2=0.03).

    Args:
        pred, target: (H, W, C) images in [0, max_val].
    """
    k1, k2 = 0.01, 0.03
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2

    kernel = _gaussian_kernel()[:, :, None, None]  # (11, 11, 1, 1)

    def filt(img):
        # img: (H, W, C) -> depthwise gaussian blur, valid padding
        x = jnp.moveaxis(img, -1, 0)[:, None]  # (C, 1, H, W)
        k = jnp.moveaxis(kernel, (0, 1, 2, 3), (2, 3, 1, 0))  # (1, 1, 11, 11)
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return jnp.moveaxis(y[:, 0], 0, -1)

    mu_p = filt(pred)
    mu_t = filt(target)
    mu_pp = filt(pred * pred)
    mu_tt = filt(target * target)
    mu_pt = filt(pred * target)

    # clamp variances: mu_pp - mu_p^2 can go slightly negative in float32,
    # which lets the per-pixel ratio exceed 1 on near-identical images
    var_p = jnp.maximum(mu_pp - mu_p**2, 0.0)
    var_t = jnp.maximum(mu_tt - mu_t**2, 0.0)
    cov = mu_pt - mu_p * mu_t
    cov = jnp.clip(cov, -jnp.sqrt(var_p * var_t), jnp.sqrt(var_p * var_t))

    s = ((2 * mu_p * mu_t + c1) * (2 * cov + c2)) / (
        (mu_p**2 + mu_t**2 + c1) * (var_p + var_t + c2)
    )
    return jnp.mean(s)


def lpips(pred: jnp.ndarray, target: jnp.ndarray, weights_path: str | None = None) -> jnp.ndarray:
    """LPIPS perceptual distance (reference: torchmetrics LPIPS with
    normalize=True, invoked via Nerfacto at NeRAF_pipeline.py:328).

    Full JAX implementation in neraf_tpu.metrics.lpips_impl; needs converted
    pretrained weights (no network egress here to fetch them). Weight
    resolution order: explicit `weights_path` arg, `NERAF_LPIPS_WEIGHTS` env
    var, `~/.cache/neraf/lpips_{alex,vgg}.npz`. Without any weights file this
    returns NaN (clearly marked unavailable) rather than silently substituting
    a different metric.
    """
    import neraf_tpu.metrics.lpips_impl as _lpips_mod

    path = weights_path or _lpips_mod.resolve_default_weights()
    if path is None:
        return jnp.asarray(jnp.nan)
    params, net = _lpips_mod.load_params(str(path))
    return _lpips_mod.lpips_distance(params, jnp.asarray(pred), jnp.asarray(target), net=net)
