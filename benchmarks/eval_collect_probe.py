#!/usr/bin/env python
"""A/B: eval-pass collection with one batch in flight vs serial force.

collect_predictions drives the trainers' threshold-search/final-eval val
pass and scripts/evaluate.py.  The trainers' predict_fn returns a DEVICE
array (jitted eval step); forcing it before dispatching the next batch
serializes H2D transfer + compute with the previous fetch.  This probe
times the full-size encode+tag forward over distinct 512px batches both
ways on the real chip.

Run plain (TPU), never concurrently with pytest.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from vae_tagger_tpu.eval.threshold import _collect

N_BATCHES = 12
BATCH = 8
RES = 512


def serial_collect(predict_fn, loader):
    """The pre-change behavior: force each batch before the next dispatch."""
    probs_all, targets_all = [], []
    for batch in loader:
        probs = np.asarray(predict_fn(batch))
        probs_all.append(probs)
        targets_all.append(np.asarray(batch["labels"]))
    return np.vstack(probs_all), np.vstack(targets_all)


def main():
    from bench_common import build_full_engine

    engine = build_full_engine()
    rng = np.random.default_rng(0)
    batches = [{
        "pixel_values": rng.integers(0, 256, (BATCH, RES, RES, 3),
                                     dtype=np.uint8),
        "labels": np.zeros((BATCH, 1000), np.float32),
    } for _ in range(N_BATCHES)]

    def predict_fn(batch):
        probs, _ = engine.classify_async(batch["pixel_values"])
        return probs  # device array: materialization is the caller's call

    out = {}
    for name, fn in (("serial", serial_collect), ("pipelined", _collect)):
        fn(predict_fn, batches[:2])  # warm compile + transfer paths
        t0 = time.perf_counter()
        y_prob, y_true = fn(predict_fn, batches)
        dt = time.perf_counter() - t0
        assert y_prob.shape == (N_BATCHES * BATCH, 1000)
        out[name] = round(dt / N_BATCHES * 1e3, 1)
        print(f"{name}: {out[name]} ms/batch", flush=True)
    out["speedup"] = round(out["serial"] / out["pipelined"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
