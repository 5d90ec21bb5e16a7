#!/usr/bin/env python
"""int8 MXU probe: is quantized inference worth building on this chip?

The v5e MXU is rated 2x int8 vs bf16 (394.7 TOPS vs 197 TFLOPS).  The
inference headline (30.5 img/s @1024px) is conv-bound at 0.757 bf16 MFU,
so an int8 encoder could in principle approach ~2x.  This probe answers
the prerequisite questions before any quantization work:

  A. dot: does int8 x int8 -> int32 `lax.dot` actually run at ~2x the
     bf16 rate (reported as util vs the 197e12 bf16 peak, so >1.0 means
     the int8 path is beating the bf16 speed-of-light)?
  B. conv: does `lax.conv_general_dilated` on int8 inputs lower to the
     fast path, or does XLA upcast/emulate it?  Measured at the two
     encoder conv shapes that dominate the profile (stage-0 and down2).

Timing follows the repo conventions (CLAUDE.md): inputs generated on
device, reps chained in one fori_loop inside one jit, loop-carried
data dependence so XLA cannot hoist or shortcut, jax.device_get sync.

Run on the real TPU: ``python benchmarks/int8_probe.py``.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

BF16_PEAK = 197e12  # v5e bf16 FLOP/s; int8 peak is 2x this


def _time(fn, *args, reps):
    jax.device_get(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    jax.device_get(fn(*args))
    return (time.perf_counter() - t0) / reps


def dot_probe(M=16384, K=512, N=512, reps=32):
    kb = jax.random.key(0)
    a8 = jax.jit(lambda k: (jax.random.normal(k, (M, K)) * 16)
                 .astype(jnp.int8))(kb)
    w8 = jax.jit(lambda k: (jax.random.normal(k, (K, N)) * 16)
                 .astype(jnp.int8))(jax.random.key(1))
    ab = jax.jit(lambda k: jax.random.normal(k, (M, K), jnp.bfloat16))(kb)
    wb = jax.jit(lambda k: jax.random.normal(k, (K, N), jnp.bfloat16)
                 )(jax.random.key(1))

    @jax.jit
    def run_i8(a, w):
        def body(i, acc):
            ai = a ^ (i & 1).astype(jnp.int8)  # loop-varying, cheap
            s = jax.lax.dot(ai, w, preferred_element_type=jnp.int32)
            return acc + jnp.sum(s, dtype=jnp.int32)
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    @jax.jit
    def run_bf(a, w):
        def body(i, acc):
            ai = a * (1 + 1e-6 * i).astype(jnp.bfloat16)
            s = jax.lax.dot(ai, w, preferred_element_type=jnp.float32)
            return acc + jnp.sum(s)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    fl = 2 * M * K * N
    t8 = _time(run_i8, a8, w8, reps=reps)
    tb = _time(run_bf, ab, wb, reps=reps)
    return {
        "shape": f"{M}x{K}x{N}",
        "bf16_us": round(tb * 1e6, 1),
        "int8_us": round(t8 * 1e6, 1),
        "bf16_util": round(fl / tb / BF16_PEAK, 3),
        "int8_util_vs_bf16_peak": round(fl / t8 / BF16_PEAK, 3),
        "speedup": round(tb / t8, 2),
    }


def conv_probe(shape, cin, cout, reps=8):
    B, H, W = shape
    kb = jax.random.key(0)
    x8 = jax.jit(lambda k: (jax.random.normal(k, (B, H, W, cin)) * 16)
                 .astype(jnp.int8))(kb)
    k8 = jax.jit(lambda k: (jax.random.normal(k, (3, 3, cin, cout)) * 16)
                 .astype(jnp.int8))(jax.random.key(1))
    xb = jax.jit(lambda k: jax.random.normal(k, (B, H, W, cin), jnp.bfloat16)
                 )(kb)
    kw = jax.jit(lambda k: jax.random.normal(k, (3, 3, cin, cout),
                                             jnp.bfloat16))(jax.random.key(1))
    dn = jax.lax.conv_dimension_numbers((B, H, W, cin), (3, 3, cin, cout),
                                        ("NHWC", "HWIO", "NHWC"))

    def conv(x, w, pet):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=pet)

    @jax.jit
    def run_i8(x, w):
        def body(i, acc):
            xi = x ^ (i & 1).astype(jnp.int8)
            s = conv(xi, w, jnp.int32)
            return acc + jnp.sum(s, dtype=jnp.int32)
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    @jax.jit
    def run_bf(x, w):
        def body(i, acc):
            xi = x * (1 + 1e-6 * i).astype(jnp.bfloat16)
            s = conv(xi, w, jnp.float32)
            return acc + jnp.sum(s)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    fl = 2 * B * H * W * 9 * cin * cout
    out = {"shape": f"{B}x{H}x{W}x{cin}->{cout}"}
    tb = _time(run_bf, xb, kw, reps=reps)
    out["bf16_ms"] = round(tb * 1e3, 2)
    out["bf16_util"] = round(fl / tb / BF16_PEAK, 3)
    try:
        t8 = _time(run_i8, x8, k8, reps=reps)
        out["int8_ms"] = round(t8 * 1e3, 2)
        out["int8_util_vs_bf16_peak"] = round(fl / t8 / BF16_PEAK, 3)
        out["speedup"] = round(tb / t8, 2)
    except Exception as e:  # int8 conv may not lower on this backend
        out["int8_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


def main():
    res = {
        "dot_16384x512x512": dot_probe(),
        "dot_65536x128x128": dot_probe(M=65536, K=128, N=128, reps=32),
        # down2-like: the best-MFU conv stage (0.783 bf16)
        "conv_down2": conv_probe((8, 256, 256), 512, 512),
        # stage0-like: the big-spatial low-channel stage (0.553 bf16)
        "conv_stage0": conv_probe((8, 1024, 1024), 128, 128),
    }
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
