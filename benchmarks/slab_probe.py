#!/usr/bin/env python
"""Probe: does H-folded slab convolution recover the full-sublane conv rate
at tiny batches?

The measured premise (docs/PERF.md adaptive-stacking section): per-pixel
conv throughput at batch rows N % 8 != 0 is ~3x below full sublane rows,
and padding the batch to 8 is memory-impossible at 1024px bs1 (14.1 GB
peak already).  Slab mode (ops/conv.py::conv2d_slabbed) folds H into the
batch instead — memory-neutral.  This measures, on chip:

  A. ResnetBlock pair at (1, 1024, 1024, 128)   — the bs1 shape today
  B. ResnetBlock pair at (8, 1024, 1024, 128)/8 — full-row per-image floor
  C. A under slab_trace(8)                       — the proposed path
  D. full VAE encode, N=1 @1024px, plain vs slab_trace(8)
  E. full VAE encode, N=3 (triplet stack) plain vs slab

Run on TPU (plain `python benchmarks/slab_probe.py`), never concurrently
with pytest (CLAUDE.md).
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

from bench_common import measure_rtt
from vae_tagger_tpu.core.config import default_flux_vae_config
from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL
from vae_tagger_tpu.nn.blocks import ResnetBlock
from vae_tagger_tpu.ops.conv import slab_trace


def timed(fn, *args, reps=3):
    jax.device_get(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(out)
    return (time.perf_counter() - t0) / reps


def block_pair_probe(batch, hw, c, chain, slabs=0, method="fixup"):
    block = ResnetBlock(c, dtype=jnp.bfloat16)
    x0 = jax.jit(lambda key: jax.random.normal(
        key, (batch, hw, hw, c), jnp.bfloat16))(jax.random.key(0))
    params = jax.jit(block.init)(jax.random.key(1), x0)

    @jax.jit
    def chained(params, x):
        def body(i, h):
            ctx = slab_trace(slabs, method) if slabs else _null()
            with ctx:
                h = block.apply(params, h)
                h = block.apply(params, h)
            return h
        return jnp.sum(jax.lax.fori_loop(0, chain, body, x)
                       .astype(jnp.float32))

    dt = timed(chained, params, x0) / chain
    flops = 2 * 2 * 2 * batch * hw * hw * 9 * c * c  # 2 blocks x 2 convs
    return dt, flops / dt / 1e12


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def encode_probe(batch, hw, chain, slabs=0, method="fixup"):
    cfg = default_flux_vae_config()
    vae = AutoencoderKL(cfg, dtype=jnp.bfloat16)
    x0 = jax.jit(lambda key: jax.random.normal(
        key, (batch, hw, hw, 3), jnp.bfloat16))(jax.random.key(2))
    params = jax.jit(vae.init)({"params": jax.random.key(3)},
                               jnp.zeros((1, 256, 256, 3)),
                               jax.random.key(4))

    @jax.jit
    def chained(params, x):
        def body(i, acc):
            ctx = slab_trace(slabs, method) if slabs else _null()
            with ctx:
                post = vae.apply(params, x + acc.astype(jnp.bfloat16),
                                 method=AutoencoderKL.encode)
            return jnp.sum(post.mean.astype(jnp.float32)) * 1e-9
        return jax.lax.fori_loop(0, chain, body, jnp.float32(0))

    dt = timed(chained, params, x0) / chain
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chain", type=int, default=4)
    p.add_argument("--only", type=str, default="",
                   help="comma-separated entry names to run (default: all)")
    args = p.parse_args()
    only = set(args.only.split(",")) if args.only else None

    rtt = measure_rtt()
    out = {"rtt_ms": round(rtt * 1e3, 1)}

    for name, (b, hw, c, slabs, method) in {
        "pair_n1_1024": (1, 1024, 128, 0, ""),
        "pair_n8_1024": (8, 1024, 128, 0, ""),
        "pair_n1_1024_slab8_halo": (1, 1024, 128, 8, "halo"),
        "pair_n1_1024_slab8_fixup": (1, 1024, 128, 8, "fixup"),
        "pair_n3_1024_slab8_fixup": (3, 1024, 128, 8, "fixup"),
        "pair_n1_512_c256": (1, 512, 256, 0, ""),
        "pair_n1_512_c256_slab8_fixup": (1, 512, 256, 8, "fixup"),
    }.items():
        if only and name not in only:
            continue
        dt, tflops = block_pair_probe(b, hw, c, args.chain, slabs, method)
        out[name] = {"ms": round(dt * 1e3, 2),
                     "tflops": round(tflops, 1),
                     "ms_per_image": round(dt * 1e3 / b, 2)}
        print(name, out[name], flush=True)

    for name, (b, hw, slabs, method) in {
        "encode_n1_1024": (1, 1024, 0, ""),
        "encode_n1_1024_slab8_fixup": (1, 1024, 8, "fixup"),
        "encode_n3_1024": (3, 1024, 0, ""),
        "encode_n3_1024_slab8_fixup": (3, 1024, 8, "fixup"),
        "encode_n8_1024": (8, 1024, 0, ""),
        # the N=3 stack is the bs1 non-remat triplet path (steps.py):
        # is the 1024px stacked-N=3 pathology also present at 512px?
        "encode_n1_512": (1, 512, 0, ""),
        "encode_n3_512": (3, 512, 0, ""),
    }.items():
        if only and name not in only:
            continue
        dt = encode_probe(b, hw, args.chain, slabs, method)
        out[name] = {"ms": round(dt * 1e3, 1),
                     "ms_per_image": round(dt * 1e3 / b, 2)}
        print(name, out[name], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
