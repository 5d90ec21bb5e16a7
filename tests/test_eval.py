"""Evaluation suite tests: metric math vs sklearn, threshold search,
artifact export, padded-row masking."""

import json

import numpy as np
from sklearn.metrics import f1_score

from vae_tagger_tpu.eval import (
    MultiLabelEvaluator,
    evaluate_model,
    find_optimal_threshold,
)


def _toy():
    y_true = np.array([[1, 0, 1], [0, 1, 0], [1, 1, 0], [0, 0, 1]],
                      dtype=np.float32)
    y_prob = np.array([[0.9, 0.2, 0.8], [0.1, 0.7, 0.3],
                       [0.6, 0.9, 0.1], [0.6, 0.1, 0.95]], dtype=np.float32)
    return y_true, y_prob


def test_evaluator_metrics_match_sklearn():
    y_true, y_prob = _toy()
    y_pred = (y_prob > 0.5).astype(np.float32)
    ev = MultiLabelEvaluator(["a", "b", "c"])
    ev.update(y_pred, y_true, y_prob)
    m = ev.compute_metrics()
    assert m["accuracy"] == 0.75  # 3 of 4 rows exact
    np.testing.assert_allclose(
        m["f1_macro"], f1_score(y_true, y_pred, average="macro"), rtol=1e-6)
    np.testing.assert_allclose(m["hamming_loss"],
                               (y_true != y_pred).mean(), rtol=1e-6)
    assert set(m["per_class"]) == {"a", "b", "c"}
    assert m["per_class"]["a"]["support"] == 2


def test_evaluator_degenerate_classes():
    y_true = np.array([[1, 0], [1, 0]], dtype=np.float32)  # b never positive
    y_prob = np.array([[0.9, 0.4], [0.8, 0.6]], dtype=np.float32)
    ev = MultiLabelEvaluator(["always", "never"])
    ev.update((y_prob > 0.5).astype(np.float32), y_true, y_prob)
    m = ev.compute_metrics()
    assert m["per_class"]["never"]["support"] == 0
    assert m["per_class"]["never"]["ap"] == 0.0
    assert m["per_class"]["always"]["recall"] == 1.0  # all-positive class


def _loader_with_padding(y_true, y_prob):
    # two batches; the second has a padded (duplicate) row
    return [
        {"labels": y_true[:2], "probs": y_prob[:2],
         "batch_mask": np.array([True, True])},
        {"labels": np.vstack([y_true[2:], y_true[2:3]]),
         "probs": np.vstack([y_prob[2:], y_prob[2:3]]),
         "batch_mask": np.array([True, True, False])},
    ]


def test_masked_rows_dropped(tmp_path):
    y_true, y_prob = _toy()
    loader = _loader_with_padding(y_true, y_prob)
    results = find_optimal_threshold(lambda b: b["probs"], loader,
                                     ["a", "b", "c"],
                                     output_dir=str(tmp_path))
    assert (tmp_path / "optimal_thresholds.json").exists()
    # the padded duplicate must not change the count: global search saw 4 rows
    data = json.loads((tmp_path / "optimal_thresholds.json").read_text())
    assert set(data["per_class_thresholds"]) == {"a", "b", "c"}
    assert 0.1 <= data["global_threshold"] <= 0.9


def test_evaluate_model_artifacts(tmp_path):
    y_true, y_prob = _toy()
    loader = _loader_with_padding(y_true, y_prob)
    metrics = evaluate_model(lambda b: b["probs"], loader, ["a", "b", "c"],
                             threshold=0.5, output_dir=str(tmp_path))
    assert (tmp_path / "evaluation_results.csv").exists()
    assert (tmp_path / "evaluation_results_overall.json").exists()
    overall = json.loads(
        (tmp_path / "evaluation_results_overall.json").read_text())
    assert overall["accuracy"] == metrics["accuracy"] == 0.75


def test_weighted_labels_truncated_like_reference():
    """Reference quirk: threshold search casts weighted labels to int,
    so a 0.8-weight positive counts as NEGATIVE (evaluation.py:231)."""
    y_true = np.array([[0.8], [1.0], [0.0]], dtype=np.float32)
    y_prob = np.array([[0.9], [0.9], [0.1]], dtype=np.float32)
    loader = [{"labels": y_true, "probs": y_prob}]
    res = find_optimal_threshold(lambda b: b["probs"], loader, ["t"])
    # with truncation only row 1 is positive; prob 0.9 -> best f1 at some
    # threshold classifying rows 0,1 positive gives precision 0.5
    assert res["per_class_thresholds"]["t"]["f1_score"] <= 1.0


def test_vectorized_threshold_sweep_matches_sklearn_loop():
    """find_optimal_threshold's vectorized F1 table must reproduce the
    reference's literal per-(class, threshold) sklearn sweep exactly —
    including first-strict-max tie-breaking (probs rounded to one decimal
    make equal-F1 runs across thresholds common) and positive-free
    classes keeping (0.5, 0.0)."""
    from vae_tagger_tpu.eval.threshold import _find_optimal_threshold_sklearn

    rng = np.random.default_rng(7)
    n, c = 48, 23
    y_prob = np.round(rng.random((n, c)), 1).astype(np.float32)
    y_true = (rng.random((n, c)) < 0.3).astype(np.float32)
    y_true[:, 5] = 0.0  # positive-free class
    names = [f"t{i}" for i in range(c)]
    loader = [{"labels": y_true, "probs": y_prob}]

    res = find_optimal_threshold(lambda b: b["probs"], loader, names)
    oracle = _find_optimal_threshold_sklearn(
        y_prob, y_true.astype(int), names, np.arange(0.1, 0.9, 0.05), None)

    assert res["global_threshold"] == oracle["global_threshold"]
    np.testing.assert_allclose(res["global_f1"], oracle["global_f1"],
                               rtol=1e-12)
    for name in names:
        a, b = (res["per_class_thresholds"][name],
                oracle["per_class_thresholds"][name])
        assert a["threshold"] == b["threshold"], name
        np.testing.assert_allclose(a["f1_score"], b["f1_score"], rtol=1e-12)
    assert res["per_class_thresholds"]["t5"] == {"threshold": 0.5,
                                                 "f1_score": 0.0}
