#!/usr/bin/env python
"""Time-boxed swing at the bs1 1024px layout churn (VERDICT r3 #8).

The device trace (benchmarks/bs1_trace_probe.py, docs/PERF.md) attributes
~97 ms of the 1024px bs1 remat train step to XLA-internal layout copies of
stage-0 activations (bf16[1024,8,130,128] {3,1,2,0}->{3,0,2,1} between
fusion outputs and conv inputs) — "no JAX-level handle" was asserted but
dimension_numbers were never tried.  This probe A/Bs the FULL remat train
step with the stage-0 convs rerouted through an explicit NCHW island
(ops/conv.py::nchw_island_trace: transpose -> NCHW conv -> transpose),
which gives XLA's layout assignment a different anchor for that region.

Per-dispatch timing minus measured RTT, fresh jit per variant.  Run on the
real TPU, never concurrently with pytest.  Verdict -> docs/PERF.md.
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

from bench_common import (
    build_full_train_setup,
    fresh_full_state,
    make_triplet_batch,
    measure_rtt,
)

RNG = np.random.default_rng(0)
H = W = 1024
REPS = 5


def measure_step(step, state, batches, keys, rtt):
    state, m = step(state, batches[0], keys[0])
    jax.device_get(m["loss"])  # compile + warm
    t0 = time.perf_counter()
    for i in range(REPS):
        state, m = step(state, batches[i % len(batches)],
                        keys[i % len(keys)])
        jax.device_get(m["loss"])
    return (time.perf_counter() - t0) / REPS - rtt


def main():
    from vae_tagger_tpu.losses.combined import LossConfig
    from vae_tagger_tpu.ops.conv import nchw_island_trace
    from vae_tagger_tpu.train.steps import make_full_steps

    rtt = measure_rtt()
    print(f"rtt {rtt * 1e3:.1f} ms", flush=True)
    res = {"rtt_ms": round(rtt * 1e3, 1)}

    vae, decoder, vp, dv, tx = build_full_train_setup(remat=True)
    cfg = LossConfig(use_focal_loss=True)
    batches = [make_triplet_batch(RNG, 1, H, W) for _ in range(2)]
    keys = list(jax.random.split(jax.random.key(0), 4))

    variants = [("baseline_nhwc", None), ("nchw_island_c128", 128),
                ("nchw_island_c256", 256)]
    for name, max_c in variants:
        step, _ = make_full_steps(vae, decoder, cfg, use_simplified=True,
                                  compute_dtype=jnp.bfloat16,
                                  checkpoint_encode=True)
        state = fresh_full_state(vp, dv, tx)
        import contextlib
        ctx = (nchw_island_trace(max_c) if max_c
               else contextlib.nullcontext())
        with ctx:  # trace-time: the first call under the context compiles
            dt = measure_step(step, state, batches, keys, rtt)
        res[name] = {"ms_per_step": round(dt * 1e3, 1)}
        print(f"{name}: {dt * 1e3:.1f} ms/step", flush=True)
        del state, step

    base = res["baseline_nhwc"]["ms_per_step"]
    for name, _ in variants[1:]:
        res[name]["vs_baseline"] = round(base / res[name]["ms_per_step"], 3)
    print(json.dumps(res, indent=2))
    out = os.path.join(os.path.dirname(__file__), "bs1_layout_probe.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
