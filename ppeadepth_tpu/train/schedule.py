"""LR schedule: StepLR(step_size=15 epochs, gamma=0.1) stepped per epoch
(trainer.py:144,418), expressed as an optax per-step schedule."""

from __future__ import annotations

import optax


def step_lr(base_lr: float, steps_per_epoch: int,
            step_size_epochs: int = 15, gamma: float = 0.1):
    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * gamma ** (epoch // step_size_epochs)

    return schedule


def make_optimizer(base_lr: float, steps_per_epoch: int,
                   step_size_epochs: int = 15, gamma: float = 0.1):
    """Adam over the trainable partition (trainer.py:141-144)."""
    return optax.adam(
        step_lr(base_lr, steps_per_epoch, step_size_epochs, gamma)
    )


def warmup_step_lr(base_lr: float, steps_per_epoch: int,
                   warmup_steps: int = 1000, warmup_factor: float = 0.1,
                   step_size_epochs: int = 15, gamma: float = 0.1):
    """WarmupStepLR (lr_scheduler.py:1-70 — dead code in the reference,
    provided for capability parity): linear warmup from
    warmup_factor*base_lr over warmup_steps, then the epoch StepLR."""

    def schedule(step):
        import jax.numpy as jnp

        warm = warmup_factor + (1 - warmup_factor) * jnp.minimum(
            step / max(warmup_steps, 1), 1.0
        )
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * warm * gamma ** (epoch // step_size_epochs)

    return schedule
