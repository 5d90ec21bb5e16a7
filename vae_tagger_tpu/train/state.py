"""Train state + optimizer construction.

The reference trains with torch AdamW (betas 0.9/0.999, eps 1e-8, weight
decay 1e-6) + diffusers scheduler + grad clipping + manual gradient
accumulation (train_full.py:180-186, 247-255).  Here that is one optax chain
compiled into the jitted update step:

  clip_by_global_norm -> adamw(schedule) [-> MultiSteps for accumulation]

A parity note: torch skips params whose grad is None (e.g. the VAE decoder
under the simplified loss); optax sees explicit zero grads, so weight decay
(1e-6) still touches such params.  Negligible at these settings, documented
for exactness.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    """Minimal functional train state (params may be a dict of submodels)."""

    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    batch_stats: Any = None

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats),
        )

    @classmethod
    def create(cls, params, tx, batch_stats=None):
        import jax.numpy as jnp

        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), batch_stats=batch_stats, tx=tx)


def build_optimizer(schedule: optax.Schedule, weight_decay: float = 1e-6,
                    max_grad_norm: float = 1.0,
                    gradient_accumulation_steps: int = 1,
                    ) -> optax.GradientTransformation:
    parts = []
    if max_grad_norm and max_grad_norm > 0:
        parts.append(optax.clip_by_global_norm(max_grad_norm))
    parts.append(optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                             weight_decay=weight_decay))
    tx = optax.chain(*parts)
    if gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=gradient_accumulation_steps)
    return tx
