"""Loss numerics parity vs torch reference formulas
(improved_losses.py semantics; see the reference's own smoke test at
improved_losses.py:350-410 for the oracle pattern)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from vae_tagger_tpu.losses import (
    bce_with_logits,
    class_balanced_loss,
    class_balanced_weights,
    contrastive_loss,
    focal_loss,
    triplet_loss,
)
from vae_tagger_tpu.losses.combined import (
    LossConfig,
    combined_loss,
    log_damped_kl,
    simplified_combined_loss,
)

RNG = np.random.default_rng(0)
B, T, D = 4, 10, 64
LOGITS = RNG.normal(size=(B, T)).astype(np.float32)
TARGETS = (RNG.random((B, T)) > 0.6).astype(np.float32)
ZA = RNG.normal(size=(B, D)).astype(np.float32)
ZP = RNG.normal(size=(B, D)).astype(np.float32)
ZN = RNG.normal(size=(B, D)).astype(np.float32)


def test_bce_parity():
    ours = float(bce_with_logits(jnp.asarray(LOGITS), jnp.asarray(TARGETS)))
    ref = float(F.binary_cross_entropy_with_logits(
        torch.from_numpy(LOGITS), torch.from_numpy(TARGETS)))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_focal_parity():
    ours = float(focal_loss(jnp.asarray(LOGITS), jnp.asarray(TARGETS),
                            alpha=1.0, gamma=2.0))
    bce = F.binary_cross_entropy_with_logits(
        torch.from_numpy(LOGITS), torch.from_numpy(TARGETS), reduction="none")
    pt = torch.exp(-bce)
    ref = float((1.0 * (1 - pt) ** 2.0 * bce).mean())
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_class_balanced_parity():
    samples = np.array([50, 3, 20, 1, 7, 100, 2, 9, 40, 5], dtype=np.float64)
    w = class_balanced_weights(samples, beta=0.9999)
    # reference formula (improved_losses.py:66-69)
    eff = 1.0 - np.power(0.9999, samples)
    ref_w = (1.0 - 0.9999) / eff
    ref_w = ref_w / ref_w.sum() * len(ref_w)
    np.testing.assert_allclose(np.asarray(w), ref_w, rtol=1e-6)

    ours = float(class_balanced_loss(jnp.asarray(LOGITS),
                                     jnp.asarray(TARGETS), w))
    bce = F.binary_cross_entropy_with_logits(
        torch.from_numpy(LOGITS), torch.from_numpy(TARGETS), reduction="none")
    ref = float((bce * torch.from_numpy(ref_w.astype(np.float32))
                 .unsqueeze(0)).mean())
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def _torch_triplet(a, p, n, al=None, pl=None, margin=1.0, sim="cosine"):
    a, p, n = map(torch.from_numpy, (a, p, n))
    if sim == "cosine":
        an, pn, nn_ = (F.normalize(t, p=2, dim=1) for t in (a, p, n))
        pos = 1 - (an * pn).sum(dim=1)
        neg = 1 - (an * nn_).sum(dim=1)
    else:
        pos = F.pairwise_distance(a, p, p=2)
        neg = F.pairwise_distance(a, n, p=2)
    loss = F.relu(pos - neg + margin)
    if al is not None:
        al, pl = torch.from_numpy(al), torch.from_numpy(pl)
        overlap = (al * pl).sum(dim=1)
        loss = loss * (1.0 + 0.5 * overlap / (al.sum(dim=1) + 1e-8))
    return float(loss.mean())


def test_triplet_parity_cosine_and_euclidean():
    for sim in ("cosine", "euclidean"):
        ours = float(triplet_loss(jnp.asarray(ZA), jnp.asarray(ZP),
                                  jnp.asarray(ZN), similarity_type=sim))
        ref = _torch_triplet(ZA, ZP, ZN, sim=sim)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, err_msg=sim)


def test_triplet_parity_weighted():
    al = TARGETS
    pl = (RNG.random((B, T)) > 0.5).astype(np.float32)
    ours = float(triplet_loss(jnp.asarray(ZA), jnp.asarray(ZP),
                              jnp.asarray(ZN), jnp.asarray(al),
                              jnp.asarray(pl)))
    ref = _torch_triplet(ZA, ZP, ZN, al, pl)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_contrastive_parity():
    l1 = TARGETS
    l2 = (RNG.random((B, T)) > 0.5).astype(np.float32)
    ours = float(contrastive_loss(jnp.asarray(ZA), jnp.asarray(ZP),
                                  jnp.asarray(l1), jnp.asarray(l2)))
    e1, e2 = torch.from_numpy(ZA), torch.from_numpy(ZP)
    dist = 1 - (F.normalize(e1, 2, 1) * F.normalize(e2, 2, 1)).sum(dim=1)
    t1, t2 = torch.from_numpy(l1), torch.from_numpy(l2)
    overlap = (t1 * t2).sum(dim=1)
    union = (t1 + t2 - t1 * t2).sum(dim=1)
    sim = overlap / (union + 1e-8)
    mask = sim > 0.3
    s_loss = mask.float() * dist ** 2
    d_loss = (~mask).float() * torch.clamp(1.0 - dist, min=0) ** 2
    w = torch.where(mask, sim, 1 - sim)
    ref = float(((s_loss + d_loss) * w).mean())
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_log_damped_kl():
    kl_a = jnp.asarray([100.0, 200.0])
    kl_p = jnp.asarray([150.0, 250.0])
    kl_n = jnp.asarray([50.0, 350.0])
    expected = np.log1p(np.mean((np.array([100, 200.]) + [150, 250.]
                                 + [50, 350.]) / 3) / 10000)
    np.testing.assert_allclose(float(log_damped_kl(kl_a, kl_p, kl_n)),
                               expected, rtol=1e-6)


def test_simplified_combined_shape_and_terms():
    cfg = LossConfig(use_focal_loss=True, triplet_weight=0.5)
    total, d = simplified_combined_loss(
        cfg, jnp.asarray(ZA), jnp.asarray(ZP), jnp.asarray(ZN),
        classification_logits=jnp.asarray(LOGITS),
        classification_targets=jnp.asarray(TARGETS),
        anchor_labels=jnp.asarray(TARGETS),
        positive_labels=jnp.asarray(TARGETS))
    assert set(d) == {"triplet_loss", "classification_loss", "total_loss"}
    np.testing.assert_allclose(
        float(total),
        0.5 * float(d["triplet_loss"]) + 1.0 * float(d["classification_loss"]),
        rtol=1e-6)


def test_combined_full_static_weights():
    cfg = LossConfig(use_focal_loss=True, reconstruction_weight=0.01,
                     kl_weight=1e-2, triplet_weight=1.0,
                     classification_weight=1.0)
    recon = RNG.normal(size=(B, 8, 8, 3)).astype(np.float32)
    target = RNG.normal(size=(B, 8, 8, 3)).astype(np.float32)
    kl = jnp.asarray(RNG.random(B).astype(np.float32) * 100)
    total, d = combined_loss(
        cfg, jnp.asarray(recon), jnp.asarray(target), kl, kl, kl,
        jnp.asarray(ZA), jnp.asarray(ZP), jnp.asarray(ZN),
        jnp.asarray(LOGITS), jnp.asarray(TARGETS),
        anchor_labels=jnp.asarray(TARGETS),
        positive_labels=jnp.asarray(TARGETS))
    manual = (0.01 * float(d["reconstruction_loss"])
              + 1e-2 * float(d["kl_loss"])
              + 1.0 * float(d["triplet_loss"])
              + 1.0 * float(d["classification_loss"]))
    np.testing.assert_allclose(float(total), manual, rtol=1e-6)


def test_adaptive_weights_module():
    import jax

    from vae_tagger_tpu.losses import AdaptiveLossWeights

    m = AdaptiveLossWeights(num_losses=4)
    losses = [jnp.asarray(1.0), jnp.asarray(2.0), jnp.asarray(3.0),
              jnp.asarray(4.0)]
    variables = m.init(jax.random.key(0), losses)
    total, weights = m.apply(variables, losses)
    # zero-initialized log weights -> uniform softmax -> mean of losses
    np.testing.assert_allclose(float(total), 2.5, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(weights), 0.25, rtol=1e-6)
