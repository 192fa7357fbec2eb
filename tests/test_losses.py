"""Spectral losses vs hand-computed / torch-computed references."""

import numpy as np
import torch

import jax.numpy as jnp

from neraf_tpu.metrics.losses import (
    log_stft_magnitude_loss,
    spectral_convergence_loss,
    spectral_loss,
    stft_loss,
)
from neraf_tpu.metrics.image import psnr, ssim


def test_spectral_convergence(rng):
    x = rng.standard_normal((4, 257)).astype(np.float32)
    y = rng.standard_normal((4, 257)).astype(np.float32)
    ref = np.linalg.norm(y - x) / np.linalg.norm(y)
    ours = float(spectral_convergence_loss(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_log_mag_loss(rng):
    x = rng.standard_normal((4, 257)).astype(np.float32)
    y = rng.standard_normal((4, 257)).astype(np.float32)
    np.testing.assert_allclose(
        float(log_stft_magnitude_loss(jnp.asarray(x), jnp.asarray(y), "l1")),
        np.mean(np.abs(y - x)), rtol=1e-5)
    np.testing.assert_allclose(
        float(log_stft_magnitude_loss(jnp.asarray(x), jnp.asarray(y), "mse")),
        np.mean((y - x) ** 2), rtol=1e-5)


def test_stft_loss_combines(rng):
    x = rng.standard_normal((8, 2, 257)).astype(np.float32) * 0.1
    y = rng.standard_normal((8, 2, 257)).astype(np.float32) * 0.1
    out = stft_loss(jnp.asarray(x), jnp.asarray(y), loss_type="mse")
    xm, ym = np.exp(x) - 1e-3, np.exp(y) - 1e-3
    np.testing.assert_allclose(float(out["audio_sc_loss"]),
                               np.linalg.norm(ym - xm) / np.linalg.norm(ym), rtol=1e-4)
    np.testing.assert_allclose(float(out["audio_mag_loss"]),
                               np.mean((y - x) ** 2), rtol=1e-4)


def test_sing_spectral_loss(rng):
    a = np.abs(rng.standard_normal((2, 257, 60))).astype(np.float32)
    b = np.abs(rng.standard_normal((2, 257, 60))).astype(np.float32)
    ref = np.mean(np.abs(np.log(1 + a) - np.log(1 + b)))
    np.testing.assert_allclose(float(spectral_loss(jnp.asarray(a), jnp.asarray(b), base="l1")),
                               ref, rtol=1e-5)
    # log-mag input type: identity transform
    ref2 = np.mean(np.abs(a - b))
    np.testing.assert_allclose(
        float(spectral_loss(jnp.asarray(a), jnp.asarray(b), base="l1", stft_input_type="log mag")),
        ref2, rtol=1e-5)


def test_psnr():
    a = np.zeros((8, 8, 3), np.float32)
    b = np.full((8, 8, 3), 0.1, np.float32)
    np.testing.assert_allclose(float(psnr(jnp.asarray(a), jnp.asarray(b))), 20.0, rtol=1e-4)


def test_ssim_identical_is_one(rng):
    img = rng.random((32, 32, 3)).astype(np.float32)
    val = float(ssim(jnp.asarray(img), jnp.asarray(img)))
    np.testing.assert_allclose(val, 1.0, atol=1e-5)


def test_ssim_degrades_with_noise(rng):
    img = rng.random((32, 32, 3)).astype(np.float32)
    noisy = np.clip(img + rng.standard_normal(img.shape).astype(np.float32) * 0.2, 0, 1)
    assert float(ssim(jnp.asarray(img), jnp.asarray(noisy))) < 0.9


def test_ssim_bounded_on_near_identical(rng):
    """float32 variance estimates must not push SSIM above 1."""
    img = rng.random((32, 32, 3)).astype(np.float32)
    near = img + rng.standard_normal(img.shape).astype(np.float32) * 1e-4
    val = float(ssim(jnp.asarray(img), jnp.asarray(np.clip(near, 0, 1))))
    assert 0.99 <= val <= 1.0 + 1e-6, val
