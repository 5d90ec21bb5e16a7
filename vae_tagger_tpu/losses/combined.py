"""Combined training losses.

Functional equivalents of the reference's loss orchestrators:
  simplified_combined_loss  (improved_losses.py:124-222) — semantic term
      (triplet or contrastive) + classification term (focal/BCE/class-balanced)
  combined_loss             (improved_losses.py:224-339) — MSE reconstruction
      + log-damped KL over the 3 triplet posteriors + triplet + classification,
      with optional learnable adaptive weights
  AdaptiveLossWeights       (improved_losses.py:107-122) — softmax(log_weights/T)
      trained jointly with the model (train_full.py:177-178)

Each returns ``(total_loss, loss_dict)``; loss_dict entries are scalars for
logging (the reference's dict layout).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .classification import bce_with_logits, class_balanced_loss, focal_loss
from .metric_learning import contrastive_loss, triplet_loss


class AdaptiveLossWeights(nn.Module):
    """Learnable loss weights: softmax(log_weights / temperature).

    A linen module so the weights join the optimizer pytree like any other
    parameter (the reference adds them to AdamW's param list).
    """

    num_losses: int = 4
    temperature: float = 1.0

    @nn.compact
    def __call__(self, losses):
        log_weights = self.param("log_weights", nn.initializers.zeros,
                                 (self.num_losses,), jnp.float32)
        weights = nn.softmax(log_weights / self.temperature)
        total = sum(w * l for w, l in zip(weights, losses))
        return total, weights


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Static loss hyperparameters shared by both orchestrators."""

    classification_weight: float = 1.0
    triplet_weight: float = 0.5
    contrastive_weight: float = 0.0
    reconstruction_weight: float = 0.01
    kl_weight: float = 1e-2
    use_focal_loss: bool = True
    use_class_balanced: bool = False
    use_contrastive: bool = False
    use_adaptive_weights: bool = False
    focal_alpha: float = 1.0
    focal_gamma: float = 2.0
    triplet_margin: float = 1.0
    contrastive_margin: float = 1.0
    similarity_type: str = "cosine"


def classification_term(cfg: LossConfig, logits, targets, cb_weights):
    if cfg.use_class_balanced and cb_weights is not None:
        return class_balanced_loss(logits, targets, cb_weights)
    if cfg.use_focal_loss:
        return focal_loss(logits, targets, cfg.focal_alpha, cfg.focal_gamma)
    return bce_with_logits(logits, targets)


def simplified_combined_loss(
    cfg: LossConfig,
    z_a, z_p, z_n=None,
    classification_logits=None,
    classification_targets=None,
    anchor_labels=None,
    positive_labels=None,
    negative_labels=None,
    cb_weights=None,
):
    """Semantic (triplet or contrastive) + classification loss."""
    loss_dict = {}
    total = jnp.float32(0.0)

    if cfg.use_contrastive and cfg.contrastive_weight > 0:
        c = contrastive_loss(z_a, z_p, anchor_labels, positive_labels,
                             margin=cfg.contrastive_margin,
                             similarity_type=cfg.similarity_type)
        total = total + cfg.contrastive_weight * c
        loss_dict["contrastive_loss"] = c
    elif cfg.triplet_weight > 0:
        t = triplet_loss(z_a, z_p, z_n, anchor_labels, positive_labels,
                         margin=cfg.triplet_margin,
                         similarity_type=cfg.similarity_type)
        total = total + cfg.triplet_weight * t
        loss_dict["triplet_loss"] = t

    if classification_logits is not None and classification_targets is not None:
        cl = classification_term(cfg, classification_logits,
                                  classification_targets, cb_weights)
        total = total + cfg.classification_weight * cl
        loss_dict["classification_loss"] = cl

    loss_dict["total_loss"] = total
    return total, loss_dict


def log_damped_kl(kl_a, kl_p, kl_n):
    """log(1 + mean_kl / 10000) averaged over the 3 triplet posteriors
    (improved_losses.py:280-287)."""
    kl_mean = jnp.mean((kl_a + kl_p + kl_n) / 3.0)
    return jnp.log1p(kl_mean / 10000.0)


def combined_loss(
    cfg: LossConfig,
    reconstruction, target_images,
    kl_a, kl_p, kl_n,
    z_a, z_p, z_n,
    classification_logits, classification_targets,
    anchor_labels=None, positive_labels=None,
    cb_weights=None,
    adaptive_weights_fn=None,
):
    """Full 4-term loss.  ``kl_*`` are the per-sample KL vectors from
    DiagonalGaussian.kl(); ``adaptive_weights_fn(losses) -> (total, weights)``
    is the bound AdaptiveLossWeights apply when cfg.use_adaptive_weights."""
    recon = jnp.mean(jnp.square(
        reconstruction.astype(jnp.float32) - target_images.astype(jnp.float32)))
    kl = log_damped_kl(kl_a, kl_p, kl_n)
    trip = triplet_loss(z_a, z_p, z_n, anchor_labels, positive_labels,
                        margin=cfg.triplet_margin,
                        similarity_type=cfg.similarity_type)
    cls = classification_term(cfg, classification_logits,
                               classification_targets, cb_weights)

    losses = [recon, kl, trip, cls]
    loss_dict = {
        "reconstruction_loss": recon,
        "kl_loss": kl,
        "triplet_loss": trip,
        "classification_loss": cls,
    }
    if cfg.use_adaptive_weights:
        if adaptive_weights_fn is None:
            raise ValueError("use_adaptive_weights requires adaptive_weights_fn")
        total, weights = adaptive_weights_fn(losses)
        loss_dict["adaptive_weights"] = weights
    else:
        total = (cfg.reconstruction_weight * recon
                 + cfg.kl_weight * kl
                 + cfg.triplet_weight * trip
                 + cfg.classification_weight * cls)
        loss_dict["weights"] = jnp.asarray([
            cfg.reconstruction_weight, cfg.kl_weight,
            cfg.triplet_weight, cfg.classification_weight])
    loss_dict["total_loss"] = total
    return total, loss_dict


def compute_class_distribution(labels_matrix) -> "jnp.ndarray":
    """Positive-image count per tag from an (N, num_tags) label matrix
    (improved_losses.py:341-348 — operates on a dataset there; here on the
    dense label matrix the data layer exposes)."""
    import numpy as np

    labels = np.asarray(labels_matrix)
    return (labels > 0).sum(axis=0).astype(np.float64)
