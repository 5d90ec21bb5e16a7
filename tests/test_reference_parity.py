"""DIRECT parity against the reference implementation.

Unlike the torch_oracle fixtures (independent reimplementations), these
tests import the actual reference modules from /root/reference — the ones
that do not require diffusers (improved_losses.py, evaluation.py) — and
assert our jnp/numpy implementations reproduce them on random data.
The reference tree is read-only and imported, never copied.
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest
import torch

import matplotlib

matplotlib.use("Agg")

sys.path.insert(0, "/root/reference")

import improved_losses as ref_losses  # noqa: E402
import evaluation as ref_evaluation  # noqa: E402

from vae_tagger_tpu.eval import MultiLabelEvaluator  # noqa: E402
from vae_tagger_tpu.losses import (  # noqa: E402
    bce_with_logits,
    class_balanced_loss,
    class_balanced_weights,
    contrastive_loss,
    focal_loss,
    triplet_loss,
)
from vae_tagger_tpu.losses.combined import (  # noqa: E402
    LossConfig,
    log_damped_kl,
    simplified_combined_loss,
)

RNG = np.random.default_rng(42)
B, T, D = 6, 12, 96
LOGITS = RNG.normal(size=(B, T)).astype(np.float32)
TARGETS = (RNG.random((B, T)) > 0.6).astype(np.float32)
PLABELS = (RNG.random((B, T)) > 0.5).astype(np.float32)
ZA = RNG.normal(size=(B, D)).astype(np.float32)
ZP = RNG.normal(size=(B, D)).astype(np.float32)
ZN = RNG.normal(size=(B, D)).astype(np.float32)

t = torch.from_numpy


def test_focal_loss_vs_reference():
    ref = float(ref_losses.FocalLoss(alpha=1.0, gamma=2.0)(
        t(LOGITS), t(TARGETS)))
    ours = float(focal_loss(jnp.asarray(LOGITS), jnp.asarray(TARGETS)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_class_balanced_loss_vs_reference():
    samples = np.array([3, 50, 7, 1, 80, 12, 4, 9, 22, 5, 60, 2], np.float64)
    ref = float(ref_losses.ClassBalancedLoss()(t(LOGITS), t(TARGETS), samples))
    w = class_balanced_weights(samples)
    ours = float(class_balanced_loss(jnp.asarray(LOGITS),
                                     jnp.asarray(TARGETS), w))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


@pytest.mark.parametrize("sim", ["cosine", "euclidean"])
def test_triplet_loss_vs_reference(sim):
    ref_fn = ref_losses.ImprovedTripletLoss(margin=1.0, similarity_type=sim)
    ref = float(ref_fn(t(ZA), t(ZP), t(ZN), t(TARGETS), t(PLABELS)))
    ours = float(triplet_loss(jnp.asarray(ZA), jnp.asarray(ZP),
                              jnp.asarray(ZN), jnp.asarray(TARGETS),
                              jnp.asarray(PLABELS), margin=1.0,
                              similarity_type=sim))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_contrastive_loss_vs_reference():
    ref_fn = ref_losses.ContrastiveLoss(margin=1.0, similarity_type="cosine")
    ref = float(ref_fn(t(ZA), t(ZP), t(TARGETS), t(PLABELS)))
    ours = float(contrastive_loss(jnp.asarray(ZA), jnp.asarray(ZP),
                                  jnp.asarray(TARGETS), jnp.asarray(PLABELS)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_simplified_combined_loss_vs_reference():
    ref_fn = ref_losses.SimplifiedCombinedLoss(
        classification_weight=1.0, triplet_weight=0.5, use_focal_loss=True)
    ref_dict = ref_fn(t(ZA), t(ZP), t(ZN), t(LOGITS), t(TARGETS),
                      anchor_labels=t(TARGETS), positive_labels=t(PLABELS))
    cfg = LossConfig(classification_weight=1.0, triplet_weight=0.5,
                     use_focal_loss=True)
    total, d = simplified_combined_loss(
        cfg, jnp.asarray(ZA), jnp.asarray(ZP), jnp.asarray(ZN),
        classification_logits=jnp.asarray(LOGITS),
        classification_targets=jnp.asarray(TARGETS),
        anchor_labels=jnp.asarray(TARGETS),
        positive_labels=jnp.asarray(PLABELS))
    np.testing.assert_allclose(float(total),
                               float(ref_dict["total_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(d["triplet_loss"]),
                               float(ref_dict["triplet_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(d["classification_loss"]),
                               float(ref_dict["classification_loss"]),
                               rtol=1e-5)


def test_combined_loss_kl_damping_vs_reference():
    """The full CombinedLoss with a mock posterior exposing analytic kl()
    (the reference's own oracle pattern, improved_losses.py:354-359)."""

    class MockPosterior:
        def __init__(self, kl_values):
            self._kl = torch.tensor(kl_values)

        def kl(self):
            return self._kl

    kl_a = RNG.random(B).astype(np.float32) * 1000
    kl_p = RNG.random(B).astype(np.float32) * 1000
    kl_n = RNG.random(B).astype(np.float32) * 1000
    recon = RNG.normal(size=(B, 3, 16, 16)).astype(np.float32)
    target = RNG.normal(size=(B, 3, 16, 16)).astype(np.float32)

    ref_fn = ref_losses.CombinedLoss(use_focal_loss=True)
    ref_dict = ref_fn(t(recon), t(target),
                      MockPosterior(kl_a), MockPosterior(kl_p),
                      MockPosterior(kl_n),
                      t(ZA), t(ZP), t(ZN), t(LOGITS), t(TARGETS),
                      anchor_labels=t(TARGETS), positive_labels=t(PLABELS))

    from vae_tagger_tpu.losses.combined import combined_loss

    cfg = LossConfig(use_focal_loss=True, reconstruction_weight=0.01,
                     kl_weight=1e-2, triplet_weight=1.0,
                     classification_weight=1.0)
    total, d = combined_loss(
        cfg, jnp.asarray(recon), jnp.asarray(target),
        jnp.asarray(kl_a), jnp.asarray(kl_p), jnp.asarray(kl_n),
        jnp.asarray(ZA), jnp.asarray(ZP), jnp.asarray(ZN),
        jnp.asarray(LOGITS), jnp.asarray(TARGETS),
        anchor_labels=jnp.asarray(TARGETS),
        positive_labels=jnp.asarray(PLABELS))
    np.testing.assert_allclose(float(d["kl_loss"]),
                               float(ref_dict["kl_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(total),
                               float(ref_dict["total_loss"]), rtol=1e-5)


def test_adaptive_weights_vs_reference():
    import jax

    from vae_tagger_tpu.losses import AdaptiveLossWeights

    losses_np = [0.5, 2.0, 1.0, 3.0]
    ref_fn = ref_losses.AdaptiveLossWeights(num_losses=4)
    with torch.no_grad():
        ref_fn.log_weights.copy_(torch.tensor([0.1, -0.2, 0.3, 0.0]))
    ref_total, ref_w = ref_fn([torch.tensor(v) for v in losses_np])

    m = AdaptiveLossWeights(num_losses=4)
    variables = {"params": {"log_weights": jnp.asarray([0.1, -0.2, 0.3, 0.0])}}
    total, w = m.apply(variables, [jnp.asarray(v) for v in losses_np])
    np.testing.assert_allclose(float(total), float(ref_total), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(w), ref_w.detach().numpy(),
                               rtol=1e-6)


def test_evaluator_vs_reference():
    """Full metric suite (incl. per-class) vs the reference evaluator on
    identical binary data."""
    y_true = (RNG.random((40, T)) > 0.7).astype(np.float32)
    y_prob = RNG.random((40, T)).astype(np.float32)
    y_pred = (y_prob > 0.5).astype(np.float32)
    names = [f"tag_{i}" for i in range(T)]

    ref_ev = ref_evaluation.MultiLabelEvaluator(names, device="cpu")
    ref_ev.update(y_pred, y_true, y_prob)
    ref_m = ref_ev.compute_metrics()

    ours_ev = MultiLabelEvaluator(names)
    ours_ev.update(y_pred, y_true, y_prob)
    our_m = ours_ev.compute_metrics()

    for key in ("accuracy", "hamming_loss", "precision_micro",
                "precision_macro", "precision_weighted", "recall_micro",
                "recall_macro", "recall_weighted", "f1_micro", "f1_macro",
                "f1_weighted", "mAP", "mAP_micro", "mAP_weighted"):
        np.testing.assert_allclose(our_m[key], ref_m[key], rtol=1e-6,
                                   err_msg=key)
    for name in names:
        for field in ("precision", "recall", "f1", "ap", "support"):
            np.testing.assert_allclose(
                our_m["per_class"][name][field],
                ref_m["per_class"][name][field], rtol=1e-6,
                err_msg=f"{name}.{field}")


def test_reference_generated_dataset_consumed(tmp_path):
    """A dataset produced by the reference's own create_test_dataset.py must
    load through our data pipeline unchanged (format compatibility both
    directions)."""
    import create_test_dataset as ref_gen

    out = str(tmp_path / "ref_ds")
    info = ref_gen.create_synthetic_dataset(output_dir=out, num_images=8)

    from vae_tagger_tpu.data.dataset import TaggedImageDataset

    ds = TaggedImageDataset(json_path=info["data_json"],
                            tags_csv_path=info["tags_csv"],
                            resolution=64, seed=0)
    assert len(ds) == 8
    item = ds[0]
    assert item["anchor"].shape == (64, 64, 3)
    assert item["labels"].sum() > 0  # weighted tags parsed
    assert (ds.labels_matrix > 0).any(axis=1).all()  # every image has tags
