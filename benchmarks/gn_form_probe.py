#!/usr/bin/env python
"""Controlled A/B: the model's GroupNorm+SiLU formulation vs a fused-cast
form, inside the stage-0 ResnetBlock pattern.

benchmarks/winograd_probe.py's "direct" baseline (plain-jnp GN+SiLU, one
fp32->bf16 cast after the silu) measured 75.7 ms for the stage-0 block
pair where the real ResnetBlock measures ~80 (slab_probe) and the
in-model stage 90.9 (stage_table).  That baseline omitted the affine —
this probe compares like-for-like, all with affine, at (8,1024,1024,128):

  A. the real ResnetBlock module (ops/normalization.py::group_norm_silu
     with its custom_vjp + ops/conv.py dispatch)
  B. plain composition of the SAME primitives without the custom_vjp
  C. single-cast form: normalize+affine+silu all in fp32, one cast to
     bf16 at the end (more accurate AND a candidate faster formulation)

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

DT = jnp.bfloat16


def conv(x, k, b):
    out = jax.lax.conv_general_dilated(
        x, k.astype(DT), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b.astype(DT)


def gn_model(x, scale, bias, groups=32):
    """Exactly ops/normalization.py::reference (minus custom_vjp)."""
    n, h, w, c = x.shape
    xg = x.astype(jnp.float32).reshape(n, h, w, groups, c // groups)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + 1e-6)
    y = xg.reshape(n, h, w, c).astype(x.dtype)
    y = y * scale.astype(x.dtype) + bias.astype(x.dtype)
    return y * jax.nn.sigmoid(y.astype(jnp.float32)).astype(y.dtype)


def gn_single_cast(x, scale, bias, groups=32):
    """normalize+affine+silu in fp32, ONE cast to the compute dtype."""
    n, h, w, c = x.shape
    xg = x.astype(jnp.float32).reshape(n, h, w, groups, c // groups)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 2, 4), keepdims=True)
    y = ((xg - mean) * jax.lax.rsqrt(var + 1e-6)).reshape(n, h, w, c)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)


def make_pair(gn):
    def pair(x, params):
        ks, bs, ss, sb = params
        h = x
        for blk in range(2):
            r = h
            h = conv(gn(h, ss[2 * blk], sb[2 * blk]), ks[2 * blk], bs[2 * blk])
            h = conv(gn(h, ss[2 * blk + 1], sb[2 * blk + 1]),
                     ks[2 * blk + 1], bs[2 * blk + 1])
            h = r + h
        return h
    return pair


def probe_fn(pair, batch, hw, c, chain, rtt):
    x0 = jax.jit(lambda k: jax.random.normal(k, (batch, hw, hw, c), DT))(
        jax.random.key(0))
    ks = [jax.jit(lambda k: jax.random.normal(k, (3, 3, c, c), jnp.float32)
                  * (1 / (3 * c ** 0.5)))(jax.random.key(i))
          for i in range(1, 5)]
    bs = [jax.jit(lambda k: jax.random.normal(k, (c,), jnp.float32) * 0.01)(
        jax.random.key(i)) for i in range(5, 9)]
    ss = [jnp.ones((c,), jnp.float32) for _ in range(4)]
    sb = [jnp.zeros((c,), jnp.float32) for _ in range(4)]
    params = (ks, bs, ss, sb)

    @jax.jit
    def chained(params, x):
        def body(i, h):
            return pair(h, params) * jnp.bfloat16(0.25)
        return jnp.sum(jax.lax.fori_loop(0, chain, body, x)
                       .astype(jnp.float32))

    jax.device_get(chained(params, x0))
    t0 = time.perf_counter()
    jax.device_get(chained(params, x0))
    dt = (time.perf_counter() - t0 - rtt) / chain
    return dt


def probe_module(batch, hw, c, chain, rtt):
    """The real ResnetBlock pair (model path A)."""
    from vae_tagger_tpu.nn.blocks import ResnetBlock
    import flax.linen as nn

    class Pair(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = ResnetBlock(c, dtype=DT)(x)
            return ResnetBlock(c, dtype=DT)(x)

    mod = Pair()
    x0 = jax.jit(lambda k: jax.random.normal(k, (batch, hw, hw, c), DT))(
        jax.random.key(0))
    params = jax.jit(mod.init)(jax.random.key(1), x0)

    @jax.jit
    def chained(params, x):
        def body(i, h):
            return mod.apply(params, h) * jnp.bfloat16(0.25)
        return jnp.sum(jax.lax.fori_loop(0, chain, body, x)
                       .astype(jnp.float32))

    jax.device_get(chained(params, x0))
    t0 = time.perf_counter()
    jax.device_get(chained(params, x0))
    return (time.perf_counter() - t0 - rtt) / chain


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chain", type=int, default=8)
    p.add_argument("--stage", type=str, default="0",
                   help="comma list of stages to run (0,1,2)")
    args = p.parse_args()
    stages = {"0": (8, 1024, 128), "1": (8, 512, 256), "2": (8, 256, 512)}

    rtt = measure_rtt()
    out = {"rtt_ms": round(rtt * 1e3, 1)}
    print(f"rtt {rtt * 1e3:.1f} ms", flush=True)

    for s in args.stage.split(","):
        b, hw, c = stages[s]
        for label, run in (
                ("A_resnetblock", lambda: probe_module(b, hw, c, args.chain,
                                                       rtt)),
                ("B_plain_same_math", lambda: probe_fn(
                    make_pair(gn_model), b, hw, c, args.chain, rtt)),
                ("C_single_cast", lambda: probe_fn(
                    make_pair(gn_single_cast), b, hw, c, args.chain, rtt))):
            dt = run()
            out[f"stage{s}_{label}"] = round(dt * 1e3, 2)
            print(f"stage{s} {label}: {dt * 1e3:.2f} ms", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
