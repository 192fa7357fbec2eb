"""Spectral losses for acoustic-field training and quick eval.

JAX ports of the loss semantics in reference NeRAF_evaluator.py:8-108 and the
SING spectral loss in NeRAF_helper.py:12-46. All functions are pure and
jit/grad-compatible.
"""

from __future__ import annotations

import jax.numpy as jnp


def spectral_convergence_loss(x_mag: jnp.ndarray, y_mag: jnp.ndarray) -> jnp.ndarray:
    """||y - x||_F / ||y||_F on magnitude spectrograms (NeRAF_evaluator.py:26)."""
    return jnp.linalg.norm(y_mag - x_mag) / jnp.linalg.norm(y_mag)


def log_stft_magnitude_loss(x_log: jnp.ndarray, y_log: jnp.ndarray,
                            loss_type: str = "l1") -> jnp.ndarray:
    """L1 or MSE between log-magnitude spectrograms (NeRAF_evaluator.py:37-53)."""
    if loss_type == "l1":
        return jnp.mean(jnp.abs(y_log - x_log))
    if loss_type == "mse":
        return jnp.mean((y_log - x_log) ** 2)
    raise ValueError(f"unknown loss_type {loss_type!r}")


def stft_loss(x_log: jnp.ndarray, y_log: jnp.ndarray, loss_type: str = "mse") -> dict:
    """Combined STFT loss on log-magnitudes (reference STFTLoss, :88-108).

    Spectral convergence is computed on magnitudes recovered via exp(x)-1e-3;
    the magnitude term stays in log space.
    """
    x_mag = jnp.exp(x_log) - 1e-3
    y_mag = jnp.exp(y_log) - 1e-3
    return {
        "audio_sc_loss": spectral_convergence_loss(x_mag, y_mag),
        "audio_mag_loss": log_stft_magnitude_loss(x_log, y_log, loss_type),
    }


def spectral_loss(a: jnp.ndarray, b: jnp.ndarray, *, base: str = "l1",
                  epsilon: float = 1.0, db: bool = False,
                  stft_input_type: str = "mag") -> jnp.ndarray:
    """SING spectral loss (reference NeRAF_helper.py:12-46).

    Compares log power-spectrograms: log(eps + X) for magnitude inputs
    (or 10*log10 in dB mode), identity for 'log mag' inputs.
    """
    def _log_spec(s):
        if stft_input_type == "log mag":
            return s
        if db:
            return 10.0 * jnp.log10(epsilon + s)
        return jnp.log(epsilon + s)

    sa, sb = _log_spec(a), _log_spec(b)
    if base == "l1":
        return jnp.mean(jnp.abs(sa - sb))
    return jnp.mean((sa - sb) ** 2)
