#!/usr/bin/env python
"""Decisive probe: what do the two 1024px ResnetBlocks (down_blocks_0)
actually cost, on the real in-model Flax path, XLA vs Pallas dispatch?

The e2e ablations (ablate.py) imply this one stage dominates the whole
encode at 1024px; this measures it directly.  Run on TPU.
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

from vae_tagger_tpu.nn.blocks import ResnetBlock
from vae_tagger_tpu.ops import backend


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backend", default="xla", choices=["xla", "pallas"])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--hw", type=int, default=1024)
    p.add_argument("--ch", type=int, default=128)
    p.add_argument("--reps", type=int, default=4)
    args = p.parse_args()

    backend.set_backend(args.backend)
    b, hw, c = args.batch, args.hw, args.ch

    block = ResnetBlock(c, dtype=jnp.bfloat16)
    x0 = jax.jit(lambda key: jax.random.normal(
        key, (1, hw, hw, c), jnp.bfloat16))(jax.random.key(0))
    params = jax.jit(block.init)(jax.random.key(1), x0)

    @jax.jit
    def chained(params, xs):
        def body(i, acc):
            x = jax.lax.dynamic_index_in_dim(xs, i, 0, keepdims=False)
            h = block.apply(params, x)
            h = block.apply(params, h)
            return acc + jnp.sum(h.astype(jnp.float32))
        return jax.lax.fori_loop(0, args.reps, body, jnp.float32(0))

    xs = jax.jit(lambda key: jax.random.normal(
        key, (args.reps, b, hw, hw, c), jnp.bfloat16))(jax.random.key(2))
    jax.device_get(jnp.sum(xs[0, 0, 0, 0]))

    jax.device_get(chained(params, xs))  # warm
    t0 = time.perf_counter()
    jax.device_get(chained(params, xs))
    dt = (time.perf_counter() - t0) / args.reps

    flops = 2 * 2 * b * hw * hw * 9 * c * c  # 2 blocks... per block 2 convs
    flops *= 2
    print(json.dumps({
        "backend": args.backend,
        "shape": f"{b}x{hw}x{hw}x{c}",
        "two_blocks_ms": round(dt * 1e3, 2),
        "conv_tflops": round(flops / dt / 1e12, 1),
    }))


if __name__ == "__main__":
    main()
