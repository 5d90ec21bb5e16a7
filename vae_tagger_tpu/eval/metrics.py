"""Multi-label evaluation metrics.

Metric definitions and output artifacts match the reference
(``/root/reference/evaluation.py:13-171``): subset accuracy, Hamming loss,
micro/macro/weighted P/R/F1, macro/micro/weighted mAP, per-class
P/R/F1/AP/support with degenerate-class guards, pretty printing, and
CSV + ``_overall.json`` export.

Pure numpy/sklearn — evaluation is host-side; the device only produces
probabilities.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional

import numpy as np
from sklearn.metrics import (
    average_precision_score,
    f1_score,
    precision_score,
    recall_score,
)


class MultiLabelEvaluator:
    def __init__(self, class_names: Optional[List[str]] = None):
        self.class_names = class_names
        self.reset_metrics()

    def reset_metrics(self):
        self.all_predictions: List[np.ndarray] = []
        self.all_targets: List[np.ndarray] = []
        self.all_probabilities: List[np.ndarray] = []

    def update(self, predictions, targets, probabilities=None):
        self.all_predictions.append(np.asarray(predictions))
        self.all_targets.append(np.asarray(targets))
        if probabilities is not None:
            self.all_probabilities.append(np.asarray(probabilities))

    def compute_metrics(self) -> Dict:
        if not self.all_targets:
            raise ValueError("update() was never called")
        # binarize weighted labels (tag:0.8 etc.): sklearn's classification
        # metrics reject continuous targets.  (The reference would crash
        # here on any weighted dataset; its threshold search truncates with
        # astype(int) instead — preserved separately in threshold.py.)
        y_true = (np.vstack(self.all_targets) > 0).astype(np.float32)
        y_pred = np.vstack(self.all_predictions)
        y_prob = (np.vstack(self.all_probabilities)
                  if self.all_probabilities else y_pred)

        metrics: Dict = {}
        metrics["accuracy"] = float((y_true == y_pred).all(axis=1).mean())
        metrics["hamming_loss"] = float((y_true != y_pred).mean())

        for average in ("micro", "macro", "weighted"):
            metrics[f"precision_{average}"] = float(precision_score(
                y_true, y_pred, average=average, zero_division=0))
            metrics[f"recall_{average}"] = float(recall_score(
                y_true, y_pred, average=average, zero_division=0))
            metrics[f"f1_{average}"] = float(f1_score(
                y_true, y_pred, average=average, zero_division=0))

        try:
            metrics["mAP"] = float(average_precision_score(
                y_true, y_prob, average="macro"))
            metrics["mAP_micro"] = float(average_precision_score(
                y_true, y_prob, average="micro"))
            metrics["mAP_weighted"] = float(average_precision_score(
                y_true, y_prob, average="weighted"))
        except ValueError as e:
            print(f"mAP: {e}")
            metrics["mAP"] = metrics["mAP_micro"] = metrics["mAP_weighted"] = 0.0

        metrics["per_class"] = self._per_class(y_true, y_pred, y_prob)
        return metrics

    def _per_class(self, y_true, y_pred, y_prob) -> Dict:
        per_class: Dict = {}
        for i in range(y_true.shape[1]):
            name = (self.class_names[i] if self.class_names else f"Class_{i}")
            support = int(y_true[:, i].sum())
            if support == 0:
                per_class[name] = dict(precision=0.0, recall=0.0, f1=0.0,
                                       ap=0.0, support=0)
            elif support == len(y_true):
                # all-positive class: recall/AP are trivially 1
                p = float((y_pred[:, i] == 1).mean())
                f1 = 2 * p / (1 + p) if (y_pred[:, i] == 1).sum() > 0 else 0.0
                per_class[name] = dict(precision=p, recall=1.0, f1=f1,
                                       ap=1.0, support=support)
            else:
                try:
                    per_class[name] = dict(
                        precision=float(precision_score(
                            y_true[:, i], y_pred[:, i], zero_division=0)),
                        recall=float(recall_score(
                            y_true[:, i], y_pred[:, i], zero_division=0)),
                        f1=float(f1_score(
                            y_true[:, i], y_pred[:, i], zero_division=0)),
                        ap=float(average_precision_score(
                            y_true[:, i], y_prob[:, i])),
                        support=support,
                    )
                except Exception as e:
                    print(f"{name}: {e}")
                    per_class[name] = dict(precision=0.0, recall=0.0,
                                           f1=0.0, ap=0.0, support=support)
        return per_class

    def print_metrics(self, metrics: Dict, detailed: bool = True):
        print(f"  Subset Accuracy: {metrics['accuracy']:.4f}")
        print(f"  Hamming Loss:    {metrics['hamming_loss']:.4f}")
        for metric_type in ("precision", "recall", "f1"):
            print(f"  {metric_type.capitalize()}:")
            for avg in ("micro", "macro", "weighted"):
                print(f"    {avg}: {metrics[f'{metric_type}_{avg}']:.4f}")
        print("\n mAP (mean Average Precision):")
        print(f"   Macro:    {metrics['mAP']:.4f}")
        print(f"   Micro:    {metrics['mAP_micro']:.4f}")
        print(f"   Weighted: {metrics['mAP_weighted']:.4f}")
        if detailed and "per_class" in metrics:
            print(f"{'':<20} {'Precision':<10} {'Recall':<10} {'F1':<10} "
                  f"{'AP':<10} {'Support':<10}")
            for name, m in metrics["per_class"].items():
                print(f"{name:<20} {m['precision']:<10.4f} "
                      f"{m['recall']:<10.4f} {m['f1']:<10.4f} "
                      f"{m['ap']:<10.4f} {m['support']:<10}")

    def save_metrics(self, metrics: Dict, output_path: str):
        """CSV for per-class + ``*_overall.json`` for the scalar metrics."""
        overall = {k: v for k, v in metrics.items() if k != "per_class"}
        with open(output_path.replace(".csv", "_overall.json"), "w",
                  encoding="utf-8") as f:
            json.dump(overall, f, indent=2, ensure_ascii=False)
        if "per_class" in metrics:
            import pandas as pd

            df = pd.DataFrame(metrics["per_class"]).T
            df.index.name = "class_name"
            df.to_csv(output_path)
            print(f"per-class metrics saved to: {output_path}")
