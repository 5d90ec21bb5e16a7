#!/usr/bin/env python
"""Flash-attention crossover microbenchmark: Pallas kernel vs XLA attention.

Measures the mid-block single-head attention (D=512, the only attention the
VAE runs — SURVEY.md §5) at every sequence length a bucketed input can
produce: S = (res/8)^2 for res in 512..1024 step 64, i.e. 4096..16384,
plus shorter control points.  Use this to set the dispatch threshold in
ops/attention.py::spatial_single_head_attention — previously a guessed
``s >= 1024`` (VERDICT r1 weak #5).

Run on the real TPU: plain `python benchmarks/attention_bench.py`.
Timings chain REPS distinct inputs inside one jitted fori_loop (per-dispatch
RTT through this harness's relay is ~100ms) and sync once with device_get.
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

from vae_tagger_tpu.ops.attention import _xla_attention
from vae_tagger_tpu.ops.pallas.flash_attention import flash_attention

SEQS = [256, 1024, 4096, 9216, 16384]
D = 512


def _time_chain(one, xs, reps):
    @jax.jit
    def run(xs):
        def body(i, acc):
            qkv = jax.lax.dynamic_index_in_dim(xs, i, 0, keepdims=False)
            q, k, v = qkv[0], qkv[1], qkv[2]
            return acc + jnp.sum(one(q, k, v).astype(jnp.float32))
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    jax.device_get(run(xs))  # warm/compile
    t0 = time.perf_counter()
    jax.device_get(run(xs))
    return (time.perf_counter() - t0) / reps


def bench_seq(s, batch, reps):
    rng = np.random.default_rng(0)
    xs = jnp.asarray(
        rng.normal(size=(reps, 3, batch, s, D)) * 0.1, jnp.bfloat16)
    t_flash = _time_chain(flash_attention, xs, reps)
    t_xla = _time_chain(_xla_attention, xs, reps)
    # attention flops: 2 matmuls of (S,S,D), MACs x2
    gflop = 2 * 2 * batch * s * s * D / 1e9
    return {
        "seq": s,
        "batch": batch,
        "flash_ms": round(t_flash * 1e3, 3),
        "xla_ms": round(t_xla * 1e3, 3),
        "speedup": round(t_xla / t_flash, 3),
        "flash_tflops": round(gflop / t_flash / 1e3, 1),
        "xla_tflops": round(gflop / t_xla / 1e3, 1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--reps", type=int, default=8)
    args = p.parse_args()
    for s in SEQS:
        print(json.dumps(bench_seq(s, args.batch, args.reps)))


if __name__ == "__main__":
    main()
