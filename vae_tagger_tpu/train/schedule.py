"""Learning-rate schedules.

Maps the diffusers ``get_scheduler`` names the reference passes
(``--lr_scheduler_type``, default "cosine" with ``--lr_warmup_steps`` 500,
train_full.py:181-186) onto optax schedules with identical shapes:
linear warmup 0 -> lr over ``warmup_steps``, then the named decay to 0 over
the remaining steps.
"""

from __future__ import annotations

import optax


def build_lr_schedule(name: str, learning_rate: float, warmup_steps: int,
                      total_steps: int) -> optax.Schedule:
    total_steps = max(total_steps, warmup_steps + 1)
    decay_steps = max(1, total_steps - warmup_steps)

    if name in ("constant",):
        return optax.constant_schedule(learning_rate)
    if name in ("constant_with_warmup",):
        return optax.join_schedules([
            optax.linear_schedule(0.0, learning_rate, warmup_steps),
            optax.constant_schedule(learning_rate),
        ], [warmup_steps])
    if name in ("linear",):
        return optax.join_schedules([
            optax.linear_schedule(0.0, learning_rate, warmup_steps),
            optax.linear_schedule(learning_rate, 0.0, decay_steps),
        ], [warmup_steps])
    if name in ("cosine",):
        return optax.join_schedules([
            optax.linear_schedule(0.0, learning_rate, warmup_steps),
            optax.cosine_decay_schedule(learning_rate, decay_steps),
        ], [warmup_steps])
    if name in ("cosine_with_restarts",):
        # one restart cycle ~ diffusers default num_cycles=1
        return optax.join_schedules([
            optax.linear_schedule(0.0, learning_rate, warmup_steps),
            optax.cosine_decay_schedule(learning_rate, decay_steps),
        ], [warmup_steps])
    if name in ("polynomial",):
        return optax.join_schedules([
            optax.linear_schedule(0.0, learning_rate, warmup_steps),
            optax.polynomial_schedule(learning_rate, 0.0, power=1.0,
                                      transition_steps=decay_steps),
        ], [warmup_steps])
    raise ValueError(f"unknown lr scheduler: {name!r}")
