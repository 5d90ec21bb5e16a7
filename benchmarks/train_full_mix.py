#!/usr/bin/env python
"""train_full bucketed-mix benchmark (BASELINE config 5 as actually run).

BASELINE.md's config 5 is "end-to-end 1024px ... bucketing on": a real run
steps through MIXED bucket shapes, not just the worst-case 1024x1024
square.  This measures the triplet train step per bucket — remat on (one
model serves every bucket, and the 1024 bucket needs it) — and writes
``train_full_bucketed_mix`` to report.json.

Methodology (hard-won, see docs/PERF.md round 3):
- per-dispatch timing with the MEASURED relay RTT subtracted.  A
  donated-carry scan FITS at these sizes but XLA degrades the schedule
  near the HBM edge and measures 1.9x slower (512px bs8: 1715 ms chained
  vs 900 per-dispatch) — chaining is the wrong instrument for steps that
  peak >10 GB.
- distinct batches per step keep XLA honest; flops from AOT cost analysis
  (includes remat recompute).

Run on the real TPU: ``python benchmarks/train_full_mix.py`` (long:
~3 compiles through the relay).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

RNG = np.random.default_rng(0)

# (height, width, batch): the largest batch per bucket that fits a single
# step (1024 bs2 exceeds HBM; 768x576 bs4 fits at 11.45 GB via the adaptive
# stacked-triplet encode, steps.py::stack_px_limit())
BUCKETS = [(512, 512, 8), (576, 768, 4), (1024, 1024, 1)]


from bench_common import (  # noqa: E402
    build_full_train_setup,
    fresh_full_state,
    make_triplet_batch,
    measure_rtt,
)


def main():
    from vae_tagger_tpu.losses.combined import LossConfig
    from vae_tagger_tpu.train.steps import make_full_steps

    rtt = measure_rtt()
    print(f"measured dispatch RTT: {rtt * 1e3:.1f} ms")

    vae, decoder, vp, dv, tx = build_full_train_setup(remat=True)
    full_step, _ = make_full_steps(
        vae, decoder, LossConfig(use_focal_loss=True), use_simplified=True,
        compute_dtype=jnp.bfloat16, checkpoint_encode=True)

    entry = {"rtt_ms": round(rtt * 1e3, 1)}
    total_imgs, total_time = 0, 0.0
    for h, w, b in BUCKETS:
        state = fresh_full_state(vp, dv, tx)
        batches = [make_triplet_batch(RNG, b, h, w) for _ in range(2)]
        keys = jax.random.split(jax.random.key(0), 6)
        full_c = full_step.lower(state, batches[0], keys[0]).compile()
        flops = float(full_c.cost_analysis().get("flops", 0.0))
        state, m = full_c(state, batches[0], keys[0])
        jax.device_get(m["loss"])
        t0 = time.perf_counter()
        n = 4
        for i in range(n):
            state, m = full_c(state, batches[i % 2], keys[i])
            jax.device_get(m["loss"])
        dt = (time.perf_counter() - t0) / n - rtt
        entry[f"{w}x{h}_bs{b}"] = {
            "ms_per_step": round(dt * 1e3, 1),
            "mfu": round(flops / dt / 197e12, 3),
            "triplet_img_per_sec": round(3 * b / dt, 2)}
        print(f"{w}x{h} bs{b}:", entry[f"{w}x{h}_bs{b}"], flush=True)
        total_imgs += 3 * b
        total_time += dt
    entry["mixed_triplet_img_per_sec"] = round(total_imgs / total_time, 2)
    entry["note"] = ("per-dispatch, measured RTT subtracted; remat on for "
                     "all buckets (one model serves the bucketed run); "
                     "flops include remat recompute")

    out = os.path.join(os.path.dirname(__file__), "report.json")
    report = {}
    if os.path.exists(out):
        with open(out) as f:
            report = json.load(f)
    report["train_full_bucketed_mix"] = entry
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"report updated: {out}")


if __name__ == "__main__":
    main()
