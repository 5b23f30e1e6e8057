"""LR schedules. Parity: linear warmup -> linear decay to 0 over total
training steps, stepped per optimizer step (reference dpr_task.py:123-151)."""
from __future__ import annotations

import optax


def linear_warmup_decay(
    base_lr: float, warmup_steps: int, total_steps: int
) -> optax.Schedule:
    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        decay = jnp.maximum(
            0.0,
            (total_steps - step) / jnp.maximum(1.0, total_steps - warmup_steps),
        )
        return base_lr * jnp.where(step < warmup_steps, warm, decay)

    return schedule
