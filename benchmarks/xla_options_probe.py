#!/usr/bin/env python
"""Probe XLA TPU compiler options on the headline forward.

Some TPU XLA knobs materially change conv-stack fusion quality (scoped VMEM
budget, latency-hiding scheduler).  They are proto-backed compile options,
so they forward through this harness's remote-compile relay even though
shell XLA_FLAGS do not.  Run one option set per invocation:

  python benchmarks/xla_options_probe.py --opts default
  python benchmarks/xla_options_probe.py --opts scoped_vmem=32768
  python benchmarks/xla_options_probe.py --opts lhs=true
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

from ablate import BATCH, REPS, RESOLUTION, build_forward  # noqa: E402


def parse_opts(spec: str) -> dict:
    if spec == "default":
        return {}
    out = {}
    for part in spec.split(","):
        k, v = part.split("=")
        k = {
            "scoped_vmem": "xla_tpu_scoped_vmem_limit_kib",
            "lhs": "xla_tpu_enable_latency_hiding_scheduler",
        }.get(k, k)
        out[k] = v
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--opts", default="default")
    args = p.parse_args()
    options = parse_opts(args.opts)

    forward, vp, dv = build_forward()

    def chained(vp, dv, buf):
        def body(i, acc):
            px = jax.lax.dynamic_index_in_dim(buf, i, 0, keepdims=False)
            return acc + jnp.sum(forward(vp, dv, px))
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    buf = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, size=(REPS, BATCH, RESOLUTION, RESOLUTION, 3),
        dtype=np.uint8))

    compiled = jax.jit(chained).lower(vp, dv, buf).compile(options or None)
    jax.device_get(compiled(vp, dv, buf))
    t0 = time.perf_counter()
    jax.device_get(compiled(vp, dv, buf))
    dt = (time.perf_counter() - t0) / REPS
    print(json.dumps({"opts": args.opts, "ms_per_batch": round(dt * 1e3, 1),
                      "images_per_sec": round(BATCH / dt, 1)}))


if __name__ == "__main__":
    main()
