#!/usr/bin/env python
"""In-context probe: Winograd F(2x2,3x3) vs XLA direct conv per stage.

The five round-2 kernel variants all recomputed the direct 9-tap conv and
none beat XLA's emitter (docs/PERF.md: ~52-56% MFU pinned at the
1024^2x128 stage).  Winograd is the untried FLOP-reduction axis: 2.25x
fewer MXU FLOPs per 3x3 conv.  This measures a GN+SiLU+conv3x3 block
PAIR (the ResnetBlock compute pattern, residual included) at the three
hot encoder stages, direct vs Winograd (ops/winograd.py, pure XLA form),
chained in one fori_loop like every stage probe.

MFU is reported over DIRECT-conv model FLOPs for both paths (so a
Winograd win shows up as >nameplate-share numbers, i.e. effective MFU).

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

from bench_common import measure_rtt
from vae_tagger_tpu.ops.winograd import conv3x3_winograd

DT = jnp.bfloat16


def gn_silu(x, groups=32):
    n, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(n, h, w, groups, c // groups)
    mu = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    y = ((xf - mu) * jax.lax.rsqrt(var + 1e-6)).reshape(n, h, w, c)
    return (y * jax.nn.sigmoid(y)).astype(DT)


def conv_direct(x, k, b):
    out = jax.lax.conv_general_dilated(
        x, k.astype(DT), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b.astype(DT)


def conv_wino(x, k, b):
    return conv3x3_winograd(x, k, b, compute_dtype=DT)


def block_pair(x, ks, bs, conv):
    # two ResnetBlock-shaped bodies: (GN->SiLU->conv) x2 + residual, twice
    h = x
    for blk in range(2):
        r = h
        h = conv(gn_silu(h), ks[2 * blk], bs[2 * blk])
        h = conv(gn_silu(h), ks[2 * blk + 1], bs[2 * blk + 1])
        h = r + h
    return h


def probe(batch, hw, c, chain, conv, rtt):
    key = jax.random.key(0)
    x0 = jax.jit(lambda k: jax.random.normal(k, (batch, hw, hw, c), DT))(key)
    ks = [jax.jit(lambda k: jax.random.normal(k, (3, 3, c, c), jnp.float32)
                  * (1 / (3 * c ** 0.5)))(jax.random.key(i))
          for i in range(1, 5)]
    bs = [jax.jit(lambda k: jax.random.normal(k, (c,), jnp.float32) * 0.01)(
        jax.random.key(i)) for i in range(5, 9)]

    @jax.jit
    def chained(ks, bs, x):
        def body(i, h):
            return block_pair(h, ks, bs, conv) * jnp.bfloat16(0.25)
        return jnp.sum(jax.lax.fori_loop(0, chain, body, x)
                       .astype(jnp.float32))

    jax.device_get(chained(ks, bs, x0))  # compile + warm
    t0 = time.perf_counter()
    out = chained(ks, bs, x0)
    jax.device_get(out)
    dt = (time.perf_counter() - t0 - rtt) / chain
    flops = 2 * 4 * batch * hw * hw * 9 * c * c  # direct-conv model flops
    return dt, flops / dt / 197e12


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chain", type=int, default=8)
    p.add_argument("--only", type=str, default="")
    args = p.parse_args()
    only = set(args.only.split(",")) if args.only else None

    rtt = measure_rtt()
    out = {"rtt_ms": round(rtt * 1e3, 1)}
    print(f"rtt {rtt * 1e3:.1f} ms", flush=True)

    for name, (b, hw, c) in {
        "stage0_1024_c128": (8, 1024, 128),
        "stage1_512_c256": (8, 512, 256),
        "stage2_256_c512": (8, 256, 512),
    }.items():
        if only and name not in only:
            continue
        for label, conv in (("direct", conv_direct), ("winograd", conv_wino)):
            dt, mfu = probe(b, hw, c, args.chain, conv, rtt)
            out[f"{name}_{label}"] = {"ms": round(dt * 1e3, 2),
                                      "model_mfu": round(mfu, 3)}
            print(name, label, out[f"{name}_{label}"], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
