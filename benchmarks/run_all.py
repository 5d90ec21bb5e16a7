#!/usr/bin/env python
"""Benchmark suite for the five BASELINE.json configs (BASELINE.md).

Unlike bench.py (the driver's single headline line), this measures every
reference workload shape and writes benchmarks/report.json:

  1. infer_full single 512px image      — per-request latency, batch 1
  2. infer_vae latent extraction        — 512px, batch 8, encode-only
  3. bucketed batch tagging             — mixed bucket shapes 512..1024
  4. train_decoder step                 — frozen VAE, 512px, batch 4
  5. train_full step                    — 1024px, batch 1, --remat
     (skipped unless --full: ~4 min compile through this harness's relay)

Methodology: throughput numbers chain REPS distinct batches inside one
jitted fori_loop (see bench.py for why); latency numbers are per-dispatch
with device_get sync.  Run on the real TPU: plain `python benchmarks/run_all.py`.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

RNG = np.random.default_rng(0)


def _sustained(forward, make_batch, reps=8):
    buf = jnp.asarray(np.stack([make_batch() for _ in range(reps)]))

    @jax.jit
    def chained(buf):
        def body(i, acc):
            px = jax.lax.dynamic_index_in_dim(buf, i, axis=0, keepdims=False)
            return acc + jnp.sum(forward(px))
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    jax.device_get(chained(buf))
    t0 = time.perf_counter()
    jax.device_get(chained(buf))
    return (time.perf_counter() - t0) / reps


def _models(policy, num_classes=1000):
    from vae_tagger_tpu.core.config import default_flux_vae_config
    from vae_tagger_tpu.infer.engine import build_decoder
    from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL

    cfg = default_flux_vae_config()
    vae = AutoencoderKL(cfg, dtype=policy.compute_dtype)
    decoder = build_decoder(num_classes, use_attention=True,
                            latent_channels=16, policy=policy)
    vp = jax.jit(vae.init)({"params": jax.random.key(0)},
                           jnp.zeros((1, 256, 256, 3)),
                           jax.random.key(1))["params"]
    dv = jax.jit(decoder.init, static_argnames=("deterministic",))(
        {"params": jax.random.key(2)}, jnp.zeros((1, 32, 32, 16)),
        deterministic=True)
    return cfg, vae, decoder, vp, dv


def _encode_tag_fn(cfg, vae, decoder, vp, dv, dtype):
    from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL, encode_scaled
    from vae_tagger_tpu.ops.image import normalize_uint8

    def forward(px):
        x = normalize_uint8(px, dtype)
        post = vae.apply({"params": vp}, x, method=AutoencoderKL.encode)
        lat = encode_scaled(post.mode(), cfg)
        logits = decoder.apply(dv, lat.astype(dtype), deterministic=True)
        return jax.nn.sigmoid(logits.astype(jnp.float32))

    return forward


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--full", action="store_true",
                        help="include the 1024px train_full config "
                        "(long compile)")
    args = parser.parse_args()

    from vae_tagger_tpu.core.precision import BF16
    from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL, encode_scaled
    from vae_tagger_tpu.ops.image import normalize_uint8

    results = {}
    cfg, vae, decoder, vp, dv = _models(BF16)
    forward = _encode_tag_fn(cfg, vae, decoder, vp, dv, jnp.bfloat16)

    # 1. single-image 512px latency (batch 1, per-dispatch)
    single = jax.jit(forward)
    px1 = jnp.asarray(RNG.integers(0, 256, (1, 512, 512, 3), dtype=np.uint8))
    jax.device_get(single(px1))
    t0 = time.perf_counter()
    for _ in range(10):
        jax.device_get(single(px1))
    lat_ms = (time.perf_counter() - t0) / 10 * 1000
    results["infer_full_single_512px"] = {
        "latency_ms": round(lat_ms, 1),
        "images_per_sec": round(1000 / lat_ms, 2)}
    print("1.", results["infer_full_single_512px"])

    # 2. latent extraction 512px batch 8 (encode only)
    def encode_only(px):
        x = normalize_uint8(px, jnp.bfloat16)
        post = vae.apply({"params": vp}, x, method=AutoencoderKL.encode)
        return jnp.sum(encode_scaled(post.mode(), cfg))

    dt = _sustained(encode_only,
                    lambda: RNG.integers(0, 256, (8, 512, 512, 3),
                                         dtype=np.uint8))
    results["infer_vae_512px_batch8"] = {
        "ms_per_batch": round(dt * 1000, 1),
        "images_per_sec": round(8 / dt, 1)}
    print("2.", results["infer_vae_512px_batch8"])

    # 3. bucketed batch tagging: representative bucket shapes
    bucket_results = {}
    total_imgs, total_time = 0, 0.0
    # batch 8: TPU packs batch into sublanes; batch 4 runs ~3x worse/pixel
    for (w, h, bs) in [(512, 512, 8), (768, 576, 8), (1024, 1024, 8)]:
        dt = _sustained(forward,
                        lambda: RNG.integers(0, 256, (bs, h, w, 3),
                                             dtype=np.uint8), reps=4)
        bucket_results[f"{w}x{h}"] = {
            "ms_per_batch": round(dt * 1000, 1),
            "images_per_sec": round(bs / dt, 1)}
        total_imgs += bs
        total_time += dt
    bucket_results["mixed_images_per_sec"] = round(total_imgs / total_time, 1)
    results["bucketed_tagging"] = bucket_results
    print("3.", bucket_results)

    # 4. train_decoder step: frozen VAE, 512px, batch 4, focal+class-balanced
    import optax

    from vae_tagger_tpu.losses.classification import class_balanced_weights
    from vae_tagger_tpu.losses.combined import LossConfig
    from vae_tagger_tpu.train.state import TrainState, build_optimizer
    from vae_tagger_tpu.train.steps import make_decoder_steps

    cb = class_balanced_weights(RNG.integers(1, 100, 1000))
    lcfg = LossConfig(use_focal_loss=True, use_class_balanced=True)
    tx = build_optimizer(optax.constant_schedule(1e-3), 1e-6, 1.0, 1)
    fresh = lambda t: jax.tree.map(jnp.array, t)  # steps donate their state
    state = TrainState.create(fresh(dv["params"]), tx,
                              batch_stats=fresh(dv.get("batch_stats")))
    train_step, _ = make_decoder_steps(vae, decoder, lcfg, cb,
                                       compute_dtype=jnp.bfloat16)
    # the loader now pads sub-8 batches from their own chunk (loader.py):
    # a 4-real batch runs as 8 rows (each sample twice — identical
    # gradients); throughput counts the 4 REAL images.  Steps are chained
    # inside ONE compiled scan over DISTINCT batches: per-dispatch timing
    # pays the relay's ~100ms RTT per step, and a loop-invariant batch
    # would let XLA hoist the (dominant) frozen-VAE encode out of the loop.
    n_steps = 4

    def mk_batch():
        px4 = RNG.integers(0, 256, (4, 512, 512, 3), dtype=np.uint8)
        lb4 = (RNG.random((4, 1000)) > 0.95).astype(np.float32)
        return {"pixel_values": np.concatenate([px4, px4]),
                "labels": np.concatenate([lb4, lb4])}

    batches = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)),
                           *[mk_batch() for _ in range(n_steps)])
    keys = jax.random.split(jax.random.key(0), n_steps)

    @jax.jit
    def chain_steps(state, vp, batches, keys):
        def body(st, xs):
            b, key = xs
            st, m = train_step(st, vp, b, key)
            return st, m["loss"]
        return jax.lax.scan(body, state, (batches, keys))

    # ONE compile: the chain is both the timed program and the flops source.
    # XLA's cost analysis counts a While-loop (scan) body ONCE regardless of
    # trip count, so the chain's flops ARE one step's flops.
    chain_c = chain_steps.lower(state, vp, batches, keys).compile()
    step_flops = float(chain_c.cost_analysis().get("flops", 0.0))

    state2, losses = chain_c(state, vp, batches, keys)
    jax.device_get(losses)
    t0 = time.perf_counter()
    state2, losses = chain_c(state, vp, batches, keys)
    jax.device_get(losses)
    dt = (time.perf_counter() - t0) / n_steps
    results["train_decoder_512px_batch4"] = {
        "ms_per_step": round(dt * 1000, 1),
        "images_per_sec": round(4 / dt, 1),
        "train_mfu": round(step_flops / dt / 197e12, 3),
        "note": "4 real images padded to 8 device rows (sublane packing, "
                "loader default on TPU); steps chained in one program"}
    print("4.", results["train_decoder_512px_batch4"])

    # 5. train_full 1024px batch1 with remat (opt-in: long compile)
    if args.full:
        from vae_tagger_tpu.core.config import default_flux_vae_config
        from vae_tagger_tpu.train.steps import make_full_steps

        vae_r = AutoencoderKL(default_flux_vae_config(),
                              dtype=jnp.bfloat16, remat=True)
        params = {"vae": fresh(vp), "decoder": fresh(dv["params"])}
        state = TrainState.create(params, tx,
                                  batch_stats=fresh(dv.get("batch_stats")))
        full_step, _ = make_full_steps(
            vae_r, decoder, LossConfig(use_focal_loss=True),
            use_simplified=True, compute_dtype=jnp.bfloat16,
            checkpoint_encode=True)
        def mk_full_batch():
            fb = {k: RNG.integers(0, 256, (1, 1024, 1024, 3), dtype=np.uint8)
                  for k in ("anchor", "positive", "negative")}
            fb["labels"] = (RNG.random((1, 1000)) > 0.95).astype(np.float32)
            fb["positive_labels"] = fb["labels"]
            return fb

        n_full = 2
        fbatches = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)),
                                *[mk_full_batch() for _ in range(n_full)])
        fkeys = jax.random.split(jax.random.key(0), n_full)
        # one AOT compile serves both the flops readout and execution
        full_c = full_step.lower(
            state, jax.tree.map(lambda x: x[0], fbatches),
            fkeys[0]).compile()
        full_flops = float(full_c.cost_analysis().get("flops", 0.0))

        # Per-dispatch timing (NOT a chained scan): the 1024px bs1 remat
        # step sits at the HBM edge — a donated-carry scan FITS (14.1 GB
        # peak) but XLA degrades the schedule to squeeze it in and measures
        # 1.9x SLOWER (1729 vs 906 ms/step, round-3 probe), so chaining is
        # the wrong instrument here.  Instead the relay's dispatch RTT is
        # MEASURED (trivial jitted scalar round trip) and subtracted, which
        # removes the known harness pollution without changing the program.
        from bench_common import measure_rtt

        rtt = measure_rtt()

        ones = [jax.tree.map(lambda x: jnp.array(x[i]), fbatches)
                for i in range(n_full)]
        state, m = full_c(state, ones[0], fkeys[0])
        jax.device_get(m["loss"])
        t0 = time.perf_counter()
        for i in range(3):
            state, m = full_c(state, ones[i % n_full], fkeys[i % n_full])
            jax.device_get(m["loss"])
        dt = (time.perf_counter() - t0) / 3
        note = ("per-dispatch timing with the measured relay RTT "
                "subtracted for the corrected figure; cost-analysis flops "
                "include remat recompute")
        results["train_full_1024px_batch1_remat"] = {
            "ms_per_step": round(dt * 1000, 1),
            "rtt_ms": round(rtt * 1000, 1),
            "ms_per_step_rtt_corrected": round((dt - rtt) * 1000, 1),
            "train_mfu": round(full_flops / dt / 197e12, 3),
            "train_mfu_rtt_corrected": round(
                full_flops / (dt - rtt) / 197e12, 3),
            "note": note}
        print("5.", results["train_full_1024px_batch1_remat"])

    out = os.path.join(os.path.dirname(__file__), "report.json")
    if os.path.exists(out):  # merge (e.g. keep a prior --full entry)
        with open(out) as f:
            prior = json.load(f)
        prior.update(results)
        results = prior
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"report written to {out}")


if __name__ == "__main__":
    main()
