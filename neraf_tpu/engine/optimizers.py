"""Optimizers and LR schedules matching the reference's nerfstudio configs.

The reference trains with four named Adam(eps=1e-15) param groups, each under
an exponential-decay schedule with optional cosine warmup
(NeRAF_config.py:115-132). This module reproduces nerfstudio's
ExponentialDecayScheduler semantics exactly as optax schedules:

    step < warmup: lr_pre_warmup + (lr - lr_pre_warmup) * sin(pi/2 * step/warmup)
    else:          exp(log(lr) * (1-t) + log(lr_final) * t),
                   t = clip((step - warmup) / (max_steps - warmup), 0, 1)
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from neraf_tpu.configs.config import OptimizerGroupConfig


def exponential_decay_schedule(
    lr_init: float,
    lr_final: float,
    max_steps: int,
    warmup_steps: int = 0,
    lr_pre_warmup: float = 1e-8,
    ramp: str = "cosine",
) -> optax.Schedule:
    """nerfstudio ExponentialDecayScheduler as an optax schedule."""

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        if warmup_steps > 0:
            frac = jnp.clip(step / warmup_steps, 0.0, 1.0)
            if ramp == "cosine":
                warm = lr_pre_warmup + (lr_init - lr_pre_warmup) * jnp.sin(
                    0.5 * jnp.pi * frac)
            else:
                warm = lr_pre_warmup + (lr_init - lr_pre_warmup) * frac
        else:
            warm = jnp.asarray(lr_init, dtype=jnp.float32)
        t = jnp.clip(
            (step - warmup_steps) / max(max_steps - warmup_steps, 1), 0.0, 1.0)
        decayed = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
        return jnp.where(step < warmup_steps, warm, decayed)

    return schedule


def make_optimizer(cfg: OptimizerGroupConfig) -> optax.GradientTransformation:
    """Adam(eps=1e-15) + exponential decay, one reference param group."""
    sched = exponential_decay_schedule(
        cfg.lr, cfg.lr_final, cfg.max_steps, cfg.warmup_steps)
    return optax.chain(
        optax.scale_by_adam(eps=cfg.eps),
        optax.scale_by_schedule(lambda s: -sched(s)),
    )


def make_multi_optimizer(groups: dict[str, OptimizerGroupConfig],
                         param_labels) -> optax.GradientTransformation:
    """optax multi_transform over named param groups.

    param_labels: pytree (or callable) mapping each leaf to a group name —
    the analogue of nerfstudio's get_param_groups() wiring, including the
    reference's cross-coupling where vision field params live in the
    audio_fields group after audio training starts (NeRAF_pipeline.py:487).
    """
    transforms = {name: make_optimizer(cfg) for name, cfg in groups.items()}
    return optax.multi_transform(transforms, param_labels)
