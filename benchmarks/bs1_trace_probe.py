#!/usr/bin/env python
"""Profiler-trace dissection of the 1024px bs1 remat train step.

bs1_backward_probe.py leaves 131.5 ms/step unaccounted (sum of parts
735 ms vs 866.7 measured).  This captures a jax.profiler trace of a few
steady-state steps and sums device-op durations from the perfetto JSON,
grouping by op kind (fusion/conv/copy/etc.), to pin where the residual
goes — and whether the backward's 0.37-vs-0.62 MFU gap is conv time or
materialization (copy/transpose) time.

If device-side tracing is unsupported through the relay, this prints
what it got and exits nonzero — a null result worth recording too.

Run on the real TPU (plain python), never concurrently with pytest.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench_common import (
    build_full_train_setup,
    fresh_full_state,
    make_triplet_batch,
)

H = W = 1024
RNG = np.random.default_rng(0)


def build_step():
    from vae_tagger_tpu.losses.combined import LossConfig
    from vae_tagger_tpu.train.steps import make_full_steps

    vae, decoder, vp, dv, tx = build_full_train_setup(remat=True)
    full_step, _ = make_full_steps(
        vae, decoder, LossConfig(use_focal_loss=True), use_simplified=True,
        compute_dtype=jnp.bfloat16, checkpoint_encode=True)
    state = fresh_full_state(vp, dv, tx)
    batches = [make_triplet_batch(RNG, 1, H, W) for _ in range(2)]
    return full_step, state, batches


def classify(name: str) -> str:
    n = name.lower()
    # order matters: "convert..." must not classify as conv
    if "convert_reduce_fusion" in n:
        return "conv+gn-stats fusion"
    if "convolution" in n or ("conv" in n and "convert" not in n):
        return "conv"
    if "fusion" in n:
        return "fusion"
    for key in ("copy", "transpose", "bitcast"):
        if key in n:
            return "copy/transpose"
    if "dot" in n:
        return "dot"
    if "custom" in n or "pallas" in n:
        return "custom/pallas"
    if "all-reduce" in n or "reduce" in n:
        return "reduce"
    return "other"


def run_train_bs1(tmp, nsteps):
    step, state, batches = build_step()
    keys = list(jax.random.split(jax.random.key(0), 4))
    comp = step.lower(state, batches[0], keys[0]).compile()
    state, m = comp(state, batches[0], keys[0])
    jax.device_get(m["loss"])

    jax.profiler.start_trace(tmp)
    for i in range(nsteps):
        state, m = comp(state, batches[i % 2], keys[i])
    jax.device_get(m["loss"])
    jax.profiler.stop_trace()


def run_infer(tmp, nsteps):
    """The bench.py headline forward: batch-8 1024px encode+tag."""
    from ablate import BATCH, RESOLUTION, build_forward

    forward, vp, dv = build_forward()
    fwd = jax.jit(forward)
    px = [jax.jit(lambda k: jax.random.randint(
        k, (BATCH, RESOLUTION, RESOLUTION, 3), 0, 256, jnp.uint8))(
            jax.random.key(i)) for i in range(2)]
    jax.device_get(fwd(vp, dv, px[0]))

    jax.profiler.start_trace(tmp)
    out = None
    for i in range(nsteps):
        out = fwd(vp, dv, px[i % 2])
    jax.device_get(out)
    jax.profiler.stop_trace()


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--target", choices=("train_bs1", "infer"),
                   default="train_bs1")
    args = p.parse_args()

    tmp = tempfile.mkdtemp(prefix="bs1trace")
    nsteps = 3
    {"train_bs1": run_train_bs1, "infer": run_infer}[args.target](tmp, nsteps)

    traces = glob.glob(os.path.join(tmp, "**", "*.trace.json.gz"),
                       recursive=True)
    print("trace files:", traces, flush=True)
    if not traces:
        everything = glob.glob(os.path.join(tmp, "**", "*"), recursive=True)
        print("no perfetto trace found; dir contents:", everything)
        sys.exit(1)

    by_kind = defaultdict(float)
    by_name = defaultdict(float)
    total = 0.0
    with gzip.open(traces[0], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device-lane complete events carry op names + dur (us)
    pids = {e.get("pid"): e.get("args", {}).get("name", "")
            for e in events if e.get("ph") == "M"
            and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pids.items()
                if "tpu" in n.lower() or "xla" in n.lower()
                or "device" in n.lower()}
    print("processes:", pids, flush=True)
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        dur = e.get("dur", 0) / 1e3 / nsteps  # ms per step
        name = e.get("name", "")
        total += dur
        by_kind[classify(name)] += dur
        by_name[name] += dur
    by_copy = defaultdict(float)
    args_sample = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        if classify(name) == "copy/transpose":
            by_copy[name] += e.get("dur", 0) / 1e3 / nsteps
            if name not in args_sample:
                args_sample[name] = e.get("args", {})
    print(json.dumps({
        "total_ms_per_step": round(total, 1),
        "by_kind_ms": {k: round(v, 1) for k, v in sorted(
            by_kind.items(), key=lambda kv: -kv[1])},
        "top20_ops_ms": {k: round(v, 1) for k, v in sorted(
            by_name.items(), key=lambda kv: -kv[1])[:20]},
        "top15_copy_ms": {k: round(v, 1) for k, v in sorted(
            by_copy.items(), key=lambda kv: -kv[1])[:15]},
        "copy_args_sample": {k: args_sample[k] for k in list(sorted(
            by_copy, key=lambda kv: -by_copy[kv]))[:5]},
    }, indent=1))


if __name__ == "__main__":
    main()
