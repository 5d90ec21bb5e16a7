#!/usr/bin/env python
"""Per-stage microbenchmark: fused GN+SiLU+conv3x3 Pallas kernel vs the XLA
reference, at every 1024px-encode ResnetBlock shape.

Run on the real TPU (plain `python benchmarks/kernel_bench.py`).  Each
timing chains REPS distinct inputs inside one jitted fori_loop (per-dispatch
RTT through this harness's relay is ~100ms — single-dispatch timing is
meaningless) and syncs once with device_get.

Use this to set the dispatch policy in ops/conv.py: the fused kernel should
only claim shapes where it beats XLA.
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

from vae_tagger_tpu.ops.conv import _make_fused, effective_affine, group_stats
from vae_tagger_tpu.ops.pallas.conv_fused import (
    gn_silu_conv3x3_pallas,
    plan_fused_conv,
)

GROUPS = 32
STAGES = [  # (h, w, c_in, c_out, residual) at 1024px encode, batch below
    (1024, 1024, 128, 128, True),
    (512, 512, 128, 256, False),   # shortcut stage measured as plain for now
    (512, 512, 256, 256, True),
    (256, 256, 256, 512, False),
    (256, 256, 512, 512, True),
    (128, 128, 512, 512, True),
]


def _time(fn, args, reps):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / reps


def bench_shape(h, w, c_in, c_out, with_res, batch, reps, tile_h=None):
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    # activations are generated ON DEVICE: the large stages are multi-GiB
    # and host->device transfer through this harness's relay takes minutes
    xs = jax.jit(lambda key: jax.random.normal(
        key, (reps, batch, h, w, c_in), dt))(jax.random.key(0))
    gs = jnp.asarray(rng.normal(size=(c_in,)) * 0.2 + 1, jnp.float32)
    gb = jnp.asarray(rng.normal(size=(c_in,)) * 0.1, jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, c_in, c_out)) * 0.05, dt)
    b = jnp.asarray(rng.normal(size=(c_out,)) * 0.1, jnp.float32)
    res = (jax.jit(lambda key: jax.random.normal(
        key, (batch, h, w, c_out), dt))(jax.random.key(1))
           if with_res else None)
    jax.device_get(jnp.sum(xs[0, 0, 0, 0]))  # sync generation

    fused_variant = _make_fused(GROUPS, 1e-6, with_res, False)
    ref = fused_variant.reference

    plan = plan_fused_conv(h, w, c_in, c_out, c_out if with_res else None, 2)
    if plan is None:
        return None
    th, tc = (tile_h or plan[0]), plan[1]

    # everything the jitted chain touches is an ARGUMENT: closed-over
    # arrays would be baked into the program as constants and blow the
    # remote-compile request size (HTTP 413) on this harness
    def fused_one(x, gs, gb, k, b, res):
        mean, meansq = group_stats(x, GROUPS)
        es, eb = effective_affine(mean, meansq, gs, gb, c_in, 1e-6)
        if with_res:
            return gn_silu_conv3x3_pallas(x, es, eb, k, b, res,
                                          tile_h=th, tile_cout=tc)
        return gn_silu_conv3x3_pallas(x, es, eb, k, b,
                                      tile_h=th, tile_cout=tc)

    def ref_one(x, gs, gb, k, b, res):
        if with_res:
            return ref(x, gs, gb, k, b, res)
        return ref(x, gs, gb, k, b)

    def chain(one):
        @jax.jit
        def run(xs, gs, gb, k, b, res):
            def body(i, acc):
                x = jax.lax.dynamic_index_in_dim(xs, i, 0, keepdims=False)
                return acc + jnp.sum(
                    one(x, gs, gb, k, b, res).astype(jnp.float32))
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        return run

    zero = jnp.zeros((1,), dt)  # placeholder when no residual
    margs = (xs, gs, gb, k, b, res if with_res else zero)
    t_fused = _time(chain(fused_one), margs, reps)
    t_ref = _time(chain(ref_one), margs, reps)
    gflop = 2 * batch * h * w * 9 * c_in * c_out / 1e9
    return {
        "shape": f"{h}x{w} {c_in}->{c_out}" + (" +res" if with_res else ""),
        "tile": [th, tc],
        "fused_ms": round(t_fused * 1e3, 2),
        "xla_ms": round(t_ref * 1e3, 2),
        "speedup": round(t_ref / t_fused, 3),
        "fused_tflops": round(gflop / t_fused / 1e3, 1),
        "xla_tflops": round(gflop / t_ref / 1e3, 1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--tile_h", type=int, default=0)
    p.add_argument("--stage", type=int, default=-1,
                   help="run only STAGES[i] (compiles through the relay are "
                        "slow; one stage per process keeps runs bounded)")
    args = p.parse_args()
    stages = STAGES if args.stage < 0 else [STAGES[args.stage]]
    rows = []
    for (h, w, ci, co, res) in stages:
        r = bench_shape(h, w, ci, co, res, args.batch, args.reps,
                        tile_h=args.tile_h or None)
        if r:
            rows.append(r)
            print(json.dumps(r))
    if rows:
        print(json.dumps({"geomean_speedup": round(
            float(np.exp(np.mean([np.log(r["speedup"]) for r in rows]))), 3)}))


if __name__ == "__main__":
    main()
