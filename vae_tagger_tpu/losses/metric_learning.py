"""Metric-learning losses on flattened latent vectors (pure jnp, fp32).

Numerics mirror ``/root/reference/improved_losses.py``:
  triplet_loss     (improved_losses.py:74-105) cosine or euclidean, optional
                   label-overlap weighting
  contrastive_loss (improved_losses.py:6-37)   Jaccard-thresholded pairs
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def _flatten(x):
    return x.reshape(x.shape[0], -1).astype(jnp.float32)


def _l2_normalize(x, eps=1e-12):
    # torch F.normalize semantics: x / max(||x||, eps)
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=1, keepdims=True))
    return x / jnp.maximum(norm, eps)


def _pairwise_distance(a, b, eps=1e-6):
    # torch F.pairwise_distance adds eps inside the norm
    return jnp.sqrt(jnp.sum(jnp.square(a - b + eps), axis=1))


def triplet_loss(anchor, positive, negative, anchor_labels=None,
                 positive_labels=None, margin: float = 1.0,
                 similarity_type: str = "cosine"):
    """Triplet hinge on flattened latents; when labels are given, weight by
    1 + 0.5 * overlap / anchor_tag_count (rarer high-overlap positives matter
    more)."""
    a, p, n = _flatten(anchor), _flatten(positive), _flatten(negative)
    if similarity_type == "cosine":
        a_n, p_n, n_n = _l2_normalize(a), _l2_normalize(p), _l2_normalize(n)
        pos_dist = 1.0 - jnp.sum(a_n * p_n, axis=1)
        neg_dist = 1.0 - jnp.sum(a_n * n_n, axis=1)
    else:
        pos_dist = _pairwise_distance(a, p)
        neg_dist = _pairwise_distance(a, n)

    basic = jnp.maximum(pos_dist - neg_dist + margin, 0.0)

    if anchor_labels is not None and positive_labels is not None:
        al = anchor_labels.astype(jnp.float32)
        pl = positive_labels.astype(jnp.float32)
        overlap = jnp.sum(al * pl, axis=1)
        weight = 1.0 + 0.5 * (overlap / (jnp.sum(al, axis=1) + _EPS))
        basic = basic * weight
    return jnp.mean(basic)


def contrastive_loss(emb1, emb2, labels1, labels2, margin: float = 1.0,
                     similarity_type: str = "cosine"):
    """Pairwise contrastive loss; pairs with label Jaccard > 0.3 count as
    similar (pulled together), others pushed past the margin; each pair
    weighted by its (dis)similarity."""
    e1, e2 = _flatten(emb1), _flatten(emb2)
    if similarity_type == "cosine":
        distance = 1.0 - jnp.sum(_l2_normalize(e1) * _l2_normalize(e2), axis=1)
    else:
        distance = _pairwise_distance(e1, e2)

    l1 = labels1.astype(jnp.float32)
    l2 = labels2.astype(jnp.float32)
    overlap = jnp.sum(l1 * l2, axis=1)
    union = jnp.sum(l1 + l2 - l1 * l2, axis=1)
    similarity = overlap / (union + _EPS)

    similar = similarity > 0.3
    similar_loss = jnp.where(similar, distance ** 2, 0.0)
    dissimilar_loss = jnp.where(
        similar, 0.0, jnp.maximum(margin - distance, 0.0) ** 2)
    weight = jnp.where(similar, similarity, 1.0 - similarity)
    return jnp.mean((similar_loss + dissimilar_loss) * weight)
