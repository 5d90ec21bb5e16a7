#!/usr/bin/env python
"""Per-stage BACKWARD probe for the 1024px bs1 encoder.

bs1_backward_probe.py measured the checkpointed N=1 encode at 38.3 ms
forward but 240.2 ms value_and_grad — backward-only is 202 ms, 5.3x the
forward, where an ideal backward (dgrad + wgrad) is ~2x.  This times
fwd and value_and_grad per encoder component at N=1 (and a couple of
N=8 references) to find which stage's backward is pathological:

  - ResnetBlock pairs at each stage shape
  - the stride-2 Downsample convs (dgrad of a strided conv is an
    input-dilated conv — a classic slow path)
  - conv_in (3->128 @ 1024^2)
  - mid-block attention (S=16384, C=512)

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

from vae_tagger_tpu.nn.blocks import Downsample, ResnetBlock
from vae_tagger_tpu.ops.attention import training_trace

DT = jnp.bfloat16


def timed(fn, args, rtt, reps=4):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / reps - rtt


def probe_module(mod, shape, rtt, wrt="params"):
    x = jax.jit(lambda k: jax.random.normal(k, shape, DT))(jax.random.key(0))
    params = jax.jit(mod.init)(jax.random.key(1), x)

    @jax.jit
    def fwd(p, x):
        return jnp.sum(mod.apply(p, x).astype(jnp.float32))

    @jax.jit
    def vg(p, x):
        # grads wrt params AND input: what the encode backward actually does
        with training_trace():
            return jax.value_and_grad(fwd, argnums=(0, 1))(p, x)

    f = timed(fwd, (params, x), rtt)
    g = timed(vg, (params, x), rtt)
    return f, g


class BlockPair(ResnetBlock):
    pass


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--only", type=str, default="")
    args = p.parse_args()
    only = set(args.only.split(",")) if args.only else None

    rtt = measure_rtt()
    out = {"rtt_ms": round(rtt * 1e3, 1)}
    print(f"rtt {rtt * 1e3:.1f} ms", flush=True)

    import flax.linen as nn

    class Pair(nn.Module):
        c: int

        @nn.compact
        def __call__(self, x):
            x = ResnetBlock(self.c, dtype=DT)(x)
            return ResnetBlock(self.c, dtype=DT)(x)

    class ConvIn(nn.Module):
        @nn.compact
        def __call__(self, x):
            from vae_tagger_tpu.nn.blocks import Conv2D
            return Conv2D(128, (3, 3), dtype=DT)(x)

    class MidAttn(nn.Module):
        @nn.compact
        def __call__(self, x):
            from vae_tagger_tpu.nn.blocks import VAEAttention
            return VAEAttention(dtype=DT)(x)

    cases = {
        "conv_in_1024": (ConvIn(), (1, 1024, 1024, 3)),
        "pair_1024_c128": (Pair(128), (1, 1024, 1024, 128)),
        "down_1024_c128": (Downsample(128, dtype=DT), (1, 1024, 1024, 128)),
        "pair_512_c256": (Pair(256), (1, 512, 512, 256)),
        "down_512_c256": (Downsample(256, dtype=DT), (1, 512, 512, 256)),
        "pair_256_c512": (Pair(512), (1, 256, 256, 512)),
        "down_256_c512": (Downsample(512, dtype=DT), (1, 256, 256, 512)),
        "pair_128_c512": (Pair(512), (1, 128, 128, 512)),
        "attn_128_c512": (MidAttn(), (1, 128, 128, 512)),
        # N=8 references: is the bad ratio batch-dependent?
        "pair_1024_c128_n8": (Pair(128), (8, 1024, 1024, 128)),
        "down_1024_c128_n8": (Downsample(128, dtype=DT),
                              (8, 1024, 1024, 128)),
    }
    for name, (mod, shape) in cases.items():
        if only and name not in only:
            continue
        f, g = probe_module(mod, shape, rtt)
        out[name] = {"fwd_ms": round(f * 1e3, 1),
                     "grad_ms": round(g * 1e3, 1),
                     "bwd_only_ms": round((g - f) * 1e3, 1),
                     "bwd_over_fwd": round((g - f) / f, 2)}
        print(name, out[name], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
