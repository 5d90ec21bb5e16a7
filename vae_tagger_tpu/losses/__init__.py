from .classification import focal_loss, bce_with_logits, class_balanced_loss, class_balanced_weights
from .metric_learning import triplet_loss, contrastive_loss
from .combined import (
    AdaptiveLossWeights,
    classification_term,
    simplified_combined_loss,
    combined_loss,
    compute_class_distribution,
)

__all__ = [
    "focal_loss",
    "bce_with_logits",
    "class_balanced_loss",
    "class_balanced_weights",
    "triplet_loss",
    "contrastive_loss",
    "AdaptiveLossWeights",
    "classification_term",
    "simplified_combined_loss",
    "combined_loss",
    "compute_class_distribution",
]
