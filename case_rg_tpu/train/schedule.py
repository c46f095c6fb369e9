"""LR schedules.

``cosine_hard_restarts_with_warmup`` reproduces transformers'
``get_cosine_with_hard_restarts_schedule_with_warmup`` used by every Run.py
(e.g. CaSE/Run.py:28: warmup 2000 over total bp-count steps, 1 cycle):
linear warmup then per-cycle cosine decay to zero.
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_hard_restarts_with_warmup(base_lr: float, warmup_steps: int,
                                     total_steps: int, num_cycles: int = 1):
    warmup = max(warmup_steps, 1)
    total = max(total_steps, warmup + 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / warmup
        progress = (step - warmup) / float(total - warmup)
        cyc = (num_cycles * progress) % 1.0
        cos = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * cyc)))
        cos = jnp.where(progress >= 1.0, 0.0, cos)
        return base_lr * jnp.where(step < warmup, warm, cos)

    return schedule
