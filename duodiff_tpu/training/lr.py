"""Learning-rate schedules.

The reference uses diffusers' get_cosine_schedule_with_warmup
(trainer.py:166-172): linear warmup 0 -> lr over num_warmup_steps, then
cosine decay to 0 at num_training_steps (half-cycle). Implemented as an
optax-compatible schedule function.
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_schedule_with_warmup(
    base_lr: float, num_warmup_steps: int, num_training_steps: int
):
    """lr(step) with diffusers semantics:
      step < warmup:  base_lr * step / max(1, warmup)
      else:           base_lr * max(0, 0.5 * (1 + cos(pi * progress)))
    where progress = (step - warmup) / max(1, total - warmup).
    """

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warmup = jnp.maximum(1.0, float(num_warmup_steps))
        total = float(num_training_steps)
        warm_lr = base_lr * step / warmup
        progress = (step - float(num_warmup_steps)) / jnp.maximum(
            1.0, total - float(num_warmup_steps)
        )
        cos_lr = base_lr * jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        )
        return jnp.where(step < float(num_warmup_steps), warm_lr, cos_lr)

    return schedule
