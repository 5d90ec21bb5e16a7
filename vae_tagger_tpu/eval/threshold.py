"""Model evaluation loop + optimal-threshold search.

Functional equivalents of ``evaluate_model`` (evaluation.py:173-200) and
``find_optimal_threshold`` (evaluation.py:202-274).  Instead of (vae, decoder,
device) these take a ``predict_fn(batch) -> probabilities`` so the same code
serves train_decoder, train_full and standalone evaluation; padded rows from
the fixed-shape loader are dropped via ``batch_mask``.

Reference quirk preserved: threshold search casts weighted labels to int
(``y_true.astype(int)``, evaluation.py:231,249), truncating partial weights
< 1.0 to negative.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional

import numpy as np

from ..utils.pipelining import OneInFlight
from .metrics import MultiLabelEvaluator


def collect_predictions(predict_fn: Callable, loader) -> tuple:
    """One full inference pass -> (y_prob, y_true), padding dropped.

    Pass the result as ``collected=`` to both find_optimal_threshold and
    evaluate_model: the reference runs a separate val pass for each
    (evaluation.py:209-222 then 173-200, called back-to-back by every
    trainer) — one pass suffices."""
    return _collect(predict_fn, loader)


def _collect(predict_fn: Callable, loader) -> tuple:
    from ..parallel.mesh import gather_to_host

    probs_all, targets_all = [], []

    def resolve(probs_dev, labels, mask):
        # gather_to_host makes probs/labels/mask GLOBAL on every process
        # (multi-host: loaders hold per-process slices, predictions are
        # device-sharded); a no-op np conversion on one host
        probs = gather_to_host(probs_dev)
        labels = gather_to_host(np.asarray(labels))
        if mask is not None:
            mask = gather_to_host(np.asarray(mask))
            probs = probs[mask]
            targets = labels[mask]
        else:
            targets = labels
        probs_all.append(probs)
        targets_all.append(targets)

    # one batch stays in flight: predict_fn's jax dispatch is async, so
    # batch N+1's host->device transfer + compute overlap materializing
    # batch N's probabilities here instead of serializing per batch
    # (measured 203 -> 148 ms/batch on the full-size 512px forward,
    # benchmarks/eval_collect_probe.py)
    pipeline = OneInFlight(resolve)
    for batch in loader:
        probs_dev = predict_fn(batch)
        pipeline.submit(probs_dev, batch["labels"], batch.get("batch_mask"))
    pipeline.flush()
    return np.vstack(probs_all), np.vstack(targets_all)


def evaluate_model(predict_fn: Callable, loader, class_names: List[str],
                   threshold: float = 0.5,
                   output_dir: Optional[str] = None,
                   collected: Optional[tuple] = None) -> Dict:
    evaluator = MultiLabelEvaluator(class_names)
    y_prob, y_true = (collected if collected is not None
                      else _collect(predict_fn, loader))
    y_pred = (y_prob > threshold).astype(np.float32)
    evaluator.update(y_pred, y_true, y_prob)
    metrics = evaluator.compute_metrics()
    evaluator.print_metrics(metrics)
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        evaluator.save_metrics(
            metrics, os.path.join(output_dir, "evaluation_results.csv"))
    return metrics


def _f1_table(y_true_int: np.ndarray, y_prob: np.ndarray,
              thresholds: np.ndarray) -> np.ndarray:
    """(T, C) table of binary F1 per (threshold, class).

    Exact sklearn ``f1_score(pos_label=1, zero_division=0)`` semantics:
    f1 = 2·tp / (2·tp + fp + fn), where the denominator equals
    |predicted positive| + |actual positive|.  Vectorized over classes —
    the reference sweeps with one sklearn call per (class, threshold)
    (evaluation.py:224-242), ~17·C calls that take minutes at realistic
    tag-vocabulary sizes on a single-core host."""
    pos = y_true_int == 1
    npos = np.count_nonzero(pos, axis=0)
    table = np.empty((len(thresholds), y_prob.shape[1]), dtype=np.float64)
    for t, thr in enumerate(thresholds):
        pred = y_prob > thr
        tp = np.count_nonzero(pred & pos, axis=0)
        denom = np.count_nonzero(pred, axis=0) + npos
        table[t] = np.where(denom > 0, 2.0 * tp / np.maximum(denom, 1), 0.0)
    return table


def _best_by_first_strict_max(f1s: np.ndarray, thresholds: np.ndarray):
    """Reference tie-break: ascending sweep, update only on strictly
    greater F1, starting from (0.5, 0.0) — i.e. the FIRST argmax wins and
    an all-zero row keeps threshold 0.5."""
    best = float(f1s.max()) if len(f1s) else 0.0
    if best <= 0.0:
        return 0.5, 0.0
    return float(thresholds[int(np.argmax(f1s))]), best


def find_optimal_threshold(predict_fn: Callable, loader,
                           class_names: List[str],
                           output_dir: Optional[str] = None,
                           collected: Optional[tuple] = None) -> Dict:
    """Sweep thresholds 0.1..0.9 step 0.05: per-class best-F1 threshold and
    a global best-macro-F1 threshold; writes ``optimal_thresholds.json``."""
    y_prob, y_true = (collected if collected is not None
                      else _collect(predict_fn, loader))
    thresholds = np.arange(0.1, 0.9, 0.05)
    y_true_int = y_true.astype(int)

    if ((y_true_int != 0) & (y_true_int != 1)).any():
        # labels outside {0,1} after the reference's int cast (weights >= 2):
        # sklearn's behavior there is mode-inference territory — defer to it
        # exactly rather than guessing
        return _find_optimal_threshold_sklearn(
            y_prob, y_true_int, class_names, thresholds, output_dir)

    table = _f1_table(y_true_int, y_prob, thresholds)  # (T, C)
    has_pos = y_true_int.sum(axis=0) > 0

    optimal: Dict[str, Dict] = {}
    for i, name in enumerate(class_names):
        if has_pos[i]:
            best_thr, best_f1 = _best_by_first_strict_max(
                table[:, i], thresholds)
        else:  # reference skips the sweep entirely for positive-free classes
            best_thr, best_f1 = 0.5, 0.0
        optimal[name] = {"threshold": best_thr, "f1_score": best_f1}

    # sklearn macro-F1 averages over ALL classes (positive-free ones
    # contribute 0 under zero_division=0), matching table.mean
    best_global_thr, best_global_f1 = _best_by_first_strict_max(
        table.mean(axis=1), thresholds)

    return _emit_threshold_results(optimal, best_global_thr, best_global_f1,
                                   output_dir)


def _find_optimal_threshold_sklearn(y_prob, y_true_int, class_names,
                                    thresholds, output_dir) -> Dict:
    """The reference's literal per-(class, threshold) sklearn sweep
    (evaluation.py:224-253); kept for label values sklearn must interpret."""
    from sklearn.metrics import f1_score

    optimal: Dict[str, Dict] = {}
    for i, name in enumerate(class_names):
        best_f1, best_thr = 0.0, 0.5
        if y_true_int[:, i].sum() > 0:
            for thr in thresholds:
                y_pred = (y_prob[:, i] > thr).astype(int)
                f1 = f1_score(y_true_int[:, i], y_pred, zero_division=0)
                if f1 > best_f1:
                    best_f1, best_thr = float(f1), float(thr)
        optimal[name] = {"threshold": best_thr, "f1_score": best_f1}

    best_global_f1, best_global_thr = 0.0, 0.5
    for thr in thresholds:
        y_pred = (y_prob > thr).astype(int)
        f1 = f1_score(y_true_int, y_pred, average="macro", zero_division=0)
        if f1 > best_global_f1:
            best_global_f1, best_global_thr = float(f1), float(thr)
    return _emit_threshold_results(optimal, best_global_thr, best_global_f1,
                                   output_dir)


def _emit_threshold_results(optimal: Dict, best_global_thr: float,
                            best_global_f1: float,
                            output_dir: Optional[str]) -> Dict:
    results = {
        "global_threshold": best_global_thr,
        "global_f1": best_global_f1,
        "per_class_thresholds": optimal,
    }
    print(f"Global Threshold: {best_global_thr:.3f} "
          f"(Macro F1: {best_global_f1:.4f})")
    print("\nPer-Class Thresholds:")
    for name, info in optimal.items():
        print(f"  {name:<20}: {info['threshold']:.3f} "
              f"(F1: {info['f1_score']:.4f})")
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        path = os.path.join(output_dir, "optimal_thresholds.json")
        with open(path, "w", encoding="utf-8") as f:
            json.dump(results, f, indent=2, ensure_ascii=False)
        print(path)
    return results
