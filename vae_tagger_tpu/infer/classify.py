"""Batched image tagging.

Output format is byte-compatible with the reference's
``classification_results.json`` (infer_full.py:106-141): per image, the
descending-confidence tags at/above the threshold, the count, the max
confidence, and the mean of the top-5 confidences — but computed over
device-sized batches instead of one image at a time.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import List

import numpy as np

from ..data.bucketing import load_and_transform_image
from ..data.paths import get_image_paths
from ..utils.profiling import ThroughputMeter
from .engine import TaggerEngine


def _format_results(tag_names: List[str], probs: np.ndarray,
                    threshold: float) -> dict:
    order = np.argsort(-probs, kind="stable")
    sorted_probs = probs[order]
    predicted = []
    for conf, idx in zip(sorted_probs, order):
        conf = float(conf)
        if conf >= threshold:
            predicted.append({
                "tag": tag_names[int(idx)],
                "confidence": float(f"{conf:.4f}"),
            })
    return {
        "predicted_tags": predicted,
        "total_tags_above_threshold": len(predicted),
        "max_confidence": float(f"{float(sorted_probs[0]):.4f}"),
        "avg_confidence_top5": float(f"{float(sorted_probs[:5].sum()) / 5:.4f}"),
    }


def infer_and_classify(engine: TaggerEngine, image_path: str,
                       output_dir: str = "inference_output",
                       resolution: int = 1024,
                       confidence_threshold: float = 0.5,
                       batch_size: int = 8,
                       output_name: str = "classification_results.json",
                       verbose: bool = True) -> dict:
    """Tag a file or directory of images; writes classification_results.json."""
    image_paths = get_image_paths(image_path)
    if not image_paths:
        print("no image files found; check the path")
        return {}

    results = {}
    processed, errors = 0, 0
    meter = ThroughputMeter()

    # decode on host (square resize, like the reference's inference
    # transform — bucketing is a training-time feature, infer_full.py:79)
    batch_imgs: List[np.ndarray] = []
    batch_paths: List[str] = []

    def flush():
        nonlocal processed
        if not batch_imgs:
            return
        n = len(batch_imgs)
        block = np.stack(batch_imgs)
        if n < batch_size:  # pad tail to the compiled batch shape
            pad = np.repeat(block[-1:], batch_size - n, axis=0)
            block = np.concatenate([block, pad], axis=0)
        probs = engine.classify(block)[:n]
        for path, p in zip(batch_paths, probs):
            results[str(path)] = _format_results(engine.tag_names, p,
                                                 confidence_threshold)
        processed += n
        meter.update(n)
        batch_imgs.clear()
        batch_paths.clear()

    for img_path in image_paths:
        try:
            img = load_and_transform_image(str(img_path),
                                           resolution=resolution)
        except Exception as e:
            errors += 1
            print(f"skipping image {img_path}: {e}")
            continue
        batch_imgs.append(img)
        batch_paths.append(str(img_path))
        if len(batch_imgs) == batch_size:
            flush()
            if verbose and processed % 100 < batch_size:
                print(f"processed {processed}/{len(image_paths)} images "
                      f"({errors} errors skipped)")
    flush()

    if verbose:
        print(f"done — ok: {processed}, failed: {errors}, "
              f"total: {len(image_paths)}, {meter.report()}")

    output_path = Path(output_dir) / output_name
    output_path.parent.mkdir(parents=True, exist_ok=True)
    with open(output_path, "w", encoding="utf-8") as f:
        json.dump(results, f, indent=4, ensure_ascii=False)
    if verbose:
        print(f"classification results saved to: {output_path}")
    return results
