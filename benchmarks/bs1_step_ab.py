#!/usr/bin/env python
"""In-context A/B of the bs1 per-member triplet encode (steps.py).

The slab probe measured the isolated encodes (512px: 10.9 ms/image at
N=1 vs 23.4 stacked-N=3; 1024px: 42.2 vs 89.9) — per CLAUDE.md, dispatch
changes need confirmation IN the real step, where the backward also runs
at the pathological shape.  This times the full non-checkpoint train_vae
and train_full steps at bs1 512px (the config the branch targets; the
1024px non-remat step does not fit HBM either way) with
steps._BS1_PER_MEMBER on vs off.

Run on the real TPU (plain python), never concurrently with pytest.
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

H = W = 512
RNG = np.random.default_rng(0)


def timed_steps(step, state, batches, keys, rtt, n=6):
    state, m = step(state, batches[0], keys[0])  # compile + warm
    jax.device_get(m["loss"])
    t0 = time.perf_counter()
    for i in range(n):
        state, m = step(state, batches[i % 2], keys[i % len(keys)])
        jax.device_get(m["loss"])
    return (time.perf_counter() - t0) / n - rtt


def main():
    from vae_tagger_tpu.losses.combined import LossConfig
    from vae_tagger_tpu.train import steps as steps_mod
    from vae_tagger_tpu.train.state import TrainState
    from vae_tagger_tpu.train.steps import make_full_steps, make_vae_steps

    rtt = measure_rtt()
    print(f"rtt {rtt * 1e3:.1f} ms", flush=True)
    res = {"rtt_ms": round(rtt * 1e3, 1)}

    # the non-checkpoint branch under test: remat off
    vae, decoder, vp, dv, tx = build_full_train_setup(remat=False)
    lcfg = LossConfig(use_focal_loss=True)
    batches = [make_triplet_batch(RNG, 1, H, W) for _ in range(2)]
    keys = list(jax.random.split(jax.random.key(0), 6))

    def vae_state():
        return TrainState.create(jax.tree.map(jnp.array, vp), tx)

    def full_state():
        return fresh_full_state(vp, dv, tx)

    for flag in (True, False):
        steps_mod._BS1_PER_MEMBER = flag
        tag = "per_member" if flag else "stacked"
        step, _ = make_vae_steps(vae, lcfg, use_simplified=True,
                                 compute_dtype=jnp.bfloat16)
        dt = timed_steps(step, vae_state(), batches, keys, rtt)
        res[f"train_vae_512_bs1_{tag}_ms"] = round(dt * 1e3, 1)
        print(f"train_vae {tag}: {dt * 1e3:.1f} ms", flush=True)

        step, _ = make_full_steps(vae, decoder, lcfg, use_simplified=True,
                                  compute_dtype=jnp.bfloat16)
        dt = timed_steps(step, full_state(), batches, keys, rtt)
        res[f"train_full_512_bs1_{tag}_ms"] = round(dt * 1e3, 1)
        print(f"train_full {tag}: {dt * 1e3:.1f} ms", flush=True)

    steps_mod._BS1_PER_MEMBER = True
    print(json.dumps(res))


if __name__ == "__main__":
    main()
