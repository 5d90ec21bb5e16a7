#!/usr/bin/env python
"""M-scaling probe for the batch-in-sublanes conv variant decision.

The hypothetical 6th fused-conv decomposition packs the batch into the
matmul M rows (8x bigger M per call).  This measures the 9-tap K=128
matmul chain — the kernel's exact compute shape — at v2's per-call M
(8192) vs the batch-packed M (65536).  Measured on the chip (2026-08-17):
util 0.132 vs 0.172 isolated, while the in-context kernels already run at
0.52-0.56 — so M-amortization is not the binding constraint and the
variant cannot win (docs/PERF.md "batch-in-sublanes" section has the full
verdict incl. the VMEM-fit arithmetic).

Run on the real TPU: ``python benchmarks/m_scaling_probe.py``.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

K = C = 128


def main():
    out = {}
    for M in (1024, 8192, 65536):
        reps = max(4, (1 << 22) // M)
        a = jax.jit(lambda k: jax.random.normal(k, (M, K), jnp.bfloat16)
                    )(jax.random.key(0))
        w = jax.jit(lambda k: jax.random.normal(k, (9, K, C), jnp.bfloat16)
                    )(jax.random.key(1))

        @jax.jit
        def run(a, w):
            def body(i, acc):
                # 9 taps like the conv kernel: 9 matmuls, K=128 each
                s = jnp.zeros((M, C), jnp.float32)
                for t in range(9):
                    s = s + jax.lax.dot(a * (1 + 1e-6 * i), w[t],
                                        preferred_element_type=jnp.float32)
                return acc + jnp.sum(s)
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

        jax.device_get(run(a, w))
        t0 = time.perf_counter()
        jax.device_get(run(a, w))
        dt = (time.perf_counter() - t0) / reps
        fl = 2 * 9 * M * K * C
        out[f"M={M}"] = {"us": round(dt * 1e6, 1),
                         "mxu_util": round(fl / dt / 197e12, 3)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
