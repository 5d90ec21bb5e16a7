#!/usr/bin/env python
"""Probe XLA TPU compile options on the 1024px bs1 remat train_full step.

bs1_backward_probe.py shows the step's backward+recompute runs at ~0.37
MFU while the same program's forward runs at 0.62, plus ~131 ms/step
unaccounted vs the sum of its parts — both smell like scheduling, so the
proto-backed compiler knobs (the ones that forward through this
harness's remote-compile relay; shell XLA_FLAGS do not) get one shot at
the train step too (round 2 probed them on the inference forward only).

  python benchmarks/train_opts_probe.py --opts default
  python benchmarks/train_opts_probe.py --opts lhs=true
  python benchmarks/train_opts_probe.py --opts scoped_vmem=32768

Run on the real TPU (plain python), never concurrently with pytest.
"""

from __future__ import annotations

import argparse
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
from xla_options_probe import parse_opts

H = W = 1024
RNG = np.random.default_rng(0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--opts", default="default")
    args = p.parse_args()
    options = parse_opts(args.opts)

    from vae_tagger_tpu.losses.combined import LossConfig
    from vae_tagger_tpu.train.steps import make_full_steps

    rtt = measure_rtt()

    vae, decoder, vp, dv, tx = build_full_train_setup(remat=True)
    full_step, _ = make_full_steps(
        vae, decoder, LossConfig(use_focal_loss=True), use_simplified=True,
        compute_dtype=jnp.bfloat16, checkpoint_encode=True)

    batches = [make_triplet_batch(RNG, 1, H, W) for _ in range(2)]
    keys = list(jax.random.split(jax.random.key(0), 6))
    state = fresh_full_state(vp, dv, tx)

    comp = full_step.lower(state, batches[0], keys[0]).compile(options or None)
    state, m = comp(state, batches[0], keys[0])
    jax.device_get(m["loss"])
    t0 = time.perf_counter()
    n = 5
    for i in range(n):
        state, m = comp(state, batches[i % 2], keys[i])
        jax.device_get(m["loss"])
    ms = ((time.perf_counter() - t0) / n - rtt) * 1e3
    print(json.dumps({"opts": args.opts, "rtt_ms": round(rtt * 1e3, 1),
                      "step_ms": round(ms, 1)}))


if __name__ == "__main__":
    main()
