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

from ..data.paths import get_image_paths
from ..utils.pipelining import OneInFlight
from ..utils.profiling import ThroughputMeter
from .engine import TaggerEngine
from .pipeline import iter_image_batches, pad_tail_rows


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
                       verbose: bool = True,
                       num_workers: int = 4,
                       prefetch_factor: int = 2,
                       transfer_format: str = "rgb") -> dict:
    """Tag a file or directory of images; writes classification_results.json.

    Decode (square resize, like the reference's inference transform —
    bucketing is a training-time feature, infer_full.py:79) runs on a thread
    pool overlapped one batch ahead of the device (see pipeline.py), so
    disk→JSON throughput tracks max(decode, compute) instead of their sum.

    ``transfer_format='yuv420'`` ships planar YUV 4:2:0 to the device (half
    the bytes; chroma upsample + color conversion fused on device) — tags
    match the RGB path to within chroma-resample noise (tests/test_yuv.py);
    the win is host decode + host->device bandwidth, relevant when those —
    not TPU compute — bound the pipeline.
    """
    image_paths = get_image_paths(image_path)
    if not image_paths:
        print("no image files found; check the path")
        return {}

    results = {}
    processed, errors = 0, 0
    meter = ThroughputMeter()

    # one batch kept in flight: batch N's (async) device dispatch runs
    # while batch N-1's probabilities are fetched + formatted on host and
    # the pipeline threads decode batch N+1
    def finalize(paths, device_probs, n):
        nonlocal processed
        probs = np.asarray(device_probs)[:n]
        for path, p in zip(paths, probs):
            results[path] = _format_results(engine.tag_names, p,
                                            confidence_threshold)
        processed += n
        meter.update(n)
        if verbose and processed % 100 < batch_size:
            print(f"processed {processed}/{len(image_paths)} images "
                  f"({errors} errors skipped)")

    pipeline = OneInFlight(finalize)
    for evt in iter_image_batches(image_paths, resolution, batch_size,
                                  num_workers, prefetch_factor,
                                  pixel_format=transfer_format):
        if evt[0] == "error":
            errors += 1
            print(f"skipping image {evt[1]}: {evt[2]}")
            continue
        _, batch_paths, block = evt
        n = len(batch_paths)
        block = pad_tail_rows(block, batch_size)  # keep the compiled shape
        if transfer_format == "yuv420":
            device_probs, _ = engine.classify_yuv_async(*block)
        else:
            device_probs, _ = engine.classify_async(block)
        pipeline.submit(batch_paths, device_probs, n)
    pipeline.flush()

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
