"""Engine: optimizers, train loops, checkpointing, joint pipeline."""

from neraf_tpu.engine.optimizers import exponential_decay_schedule, make_optimizer

__all__ = ["exponential_decay_schedule", "make_optimizer"]
