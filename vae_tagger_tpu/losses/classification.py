"""Multi-label classification losses (pure jnp, fp32).

Numerics match ``/root/reference/improved_losses.py`` exactly so training
dynamics reproduce:
  focal_loss          (improved_losses.py:39-56)
  class_balanced_loss (improved_losses.py:58-72, Cui et al. effective numbers)

All losses compute in fp32 regardless of model compute dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _bce_elementwise(logits, targets):
    """Per-element binary cross-entropy with logits (torch
    ``binary_cross_entropy_with_logits`` semantics, reduction='none')."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # max(x,0) - x*t + log(1 + exp(-|x|)) — the numerically stable form
    return (jnp.maximum(logits, 0.0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def bce_with_logits(logits, targets):
    """Mean BCE-with-logits (torch ``nn.BCEWithLogitsLoss`` default)."""
    return jnp.mean(_bce_elementwise(logits, targets))


def focal_loss(logits, targets, alpha: float = 1.0, gamma: float = 2.0,
               reduction: str = "mean"):
    """Multi-label focal loss: alpha * (1 - exp(-bce))**gamma * bce."""
    bce = _bce_elementwise(logits, targets)
    pt = jnp.exp(-bce)
    fl = alpha * (1.0 - pt) ** gamma * bce
    if reduction == "mean":
        return jnp.mean(fl)
    if reduction == "sum":
        return jnp.sum(fl)
    return fl


def class_balanced_weights(samples_per_class, beta: float = 0.9999):
    """Cui et al. effective-number weights, normalized to sum to num_classes.

    Host-side (numpy): the class distribution is static per run, so the
    weights are baked into the compiled step as a constant.
    """
    samples_per_class = np.asarray(samples_per_class, dtype=np.float64)
    # a tag with zero positive images would make effective_num 0 -> inf/NaN
    # weights poisoning every step (latent flaw in the reference too); treat
    # it as count 1 (maximum weight, harmless: the class has no positives)
    samples_per_class = np.maximum(samples_per_class, 1.0)
    effective_num = 1.0 - np.power(beta, samples_per_class)
    weights = (1.0 - beta) / effective_num
    weights = weights / weights.sum() * len(weights)
    return jnp.asarray(weights, dtype=jnp.float32)


def class_balanced_loss(logits, targets, weights):
    """Per-element BCE scaled by per-class effective-number weights.

    ``weights`` must come from :func:`class_balanced_weights` (the reference
    recomputes them every call — improved_losses.py:66-69 — but they only
    depend on the static class distribution, so hoisting is exact).
    """
    bce = _bce_elementwise(logits, targets)
    return jnp.mean(bce * weights[None, :])
