#!/usr/bin/env python
"""Per-stage ms/MFU table for the 1024px encode — machine-checked.

docs/PERF.md's claim that every conv stage sits at its per-pass floor
(56-75% MFU) was prose-only; this emits the measured table into
benchmarks/report.json (``per_stage_1024px``) so a future regression —
a dispatch-policy change, an XLA update, a kernel edit — is visible to the
driver instead of silently eating the headline number (VERDICT r2 weak #2).

Stages (batch 8, bf16, the in-model Flax path):
  down_blocks_0: 2 ResnetBlocks @ 1024^2 x 128
  down_blocks_1: 2 ResnetBlocks @  512^2 x 256
  down_blocks_2: 2 ResnetBlocks @  256^2 x 512
  down_blocks_3: 2 ResnetBlocks @  128^2 x 512
  mid attention: flash_attention S=16384, D=512

Methodology: reps distinct inputs chained in one jitted fori_loop, synced
once (per-dispatch RTT through this harness's relay is ~100ms).  Inputs are
generated ON device.  Run on the real TPU: ``python benchmarks/stage_table.py``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

PEAK = 197e12  # v5e bf16 nameplate
B = 8


def _time_chain(fn, xs, reps):
    @jax.jit
    def chained(xs):
        def body(i, acc):
            x = jax.lax.dynamic_index_in_dim(xs, i, 0, keepdims=False)
            return acc + fn(x)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    jax.device_get(chained(xs))  # compile + warm
    t0 = time.perf_counter()
    jax.device_get(chained(xs))
    return (time.perf_counter() - t0) / reps


def bench_resnet_stage(hw: int, c: int, reps: int):
    from vae_tagger_tpu.nn.blocks import ResnetBlock

    block = ResnetBlock(c, dtype=jnp.bfloat16)
    x0 = jax.jit(lambda k: jax.random.normal(k, (1, hw, hw, c),
                                             jnp.bfloat16))(jax.random.key(0))
    params = jax.jit(block.init)(jax.random.key(1), x0)

    def two_blocks(x):
        h = block.apply(params, x)
        h = block.apply(params, h)
        return jnp.sum(h.astype(jnp.float32))

    xs = jax.jit(lambda k: jax.random.normal(
        k, (reps, B, hw, hw, c), jnp.bfloat16))(jax.random.key(2))
    dt = _time_chain(two_blocks, xs, reps)
    # 2 blocks x 2 3x3 convs, 2 flops/MAC
    flops = 2 * 2 * 2 * B * hw * hw * 9 * c * c
    return {"ms": round(dt * 1e3, 1), "mfu": round(flops / dt / PEAK, 3)}


def bench_attention(s: int, d: int, reps: int):
    from vae_tagger_tpu.ops.pallas.flash_attention import flash_attention

    def attn(qkv):
        return jnp.sum(flash_attention(qkv[0], qkv[1], qkv[2]
                                       ).astype(jnp.float32))

    xs = jax.jit(lambda k: jax.random.normal(
        k, (reps, 3, B, s, d), jnp.bfloat16) * 0.1)(jax.random.key(3))
    dt = _time_chain(attn, xs, reps)
    flops = 2 * 2 * B * s * s * d
    return {"ms": round(dt * 1e3, 1), "mfu": round(flops / dt / PEAK, 3)}


def main():
    table = {}
    for name, hw, c, reps in [("down0_1024x128", 1024, 128, 4),
                              ("down1_512x256", 512, 256, 8),
                              ("down2_256x512", 256, 512, 8),
                              ("down3_128x512", 128, 512, 8)]:
        table[name] = bench_resnet_stage(hw, c, reps)
        print(name, table[name], flush=True)
    table["mid_attention_s16384"] = bench_attention(16384, 512, 4)
    print("mid_attention_s16384", table["mid_attention_s16384"], flush=True)

    out = os.path.join(os.path.dirname(__file__), "report.json")
    report = {}
    if os.path.exists(out):
        with open(out) as f:
            report = json.load(f)
    report["per_stage_1024px"] = table
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"report updated: {out}")


if __name__ == "__main__":
    main()
