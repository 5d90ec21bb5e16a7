#!/usr/bin/env python
"""Probe: two candidate optimizations for the 512px bs8 train_full bucket
(0.585 MFU in the round-3 bucketed mix — the weakest full-sublane config).

A. Flash attention in the TRAINING context at S=4096.  The measured
   S>=4608 dispatch threshold (ops/attention.py) came from a FORWARD-only
   sweep (benchmarks/attention_bench.py); in a train step XLA's attention
   backward re-materializes B*S^2 fp32 scores (24 x 4096^2 x 4B = 1.6 GB
   per pass at bs8 triplets) while the Pallas backward stays O(S).
   MEASURED 2026-08-17: flash 868.4 ms / 11.21 GB peak vs XLA 881.7 ms /
   12.06 GB -> ops/attention.py now carries _FLASH_MIN_SEQ_TRAIN = 4096
   and train-step tracing runs under attention.training_trace(), so the
   "base" case below dispatches flash by default (re-measured 859.0 ms,
   MFU 0.711).  Use "xla" to reproduce the old dispatch.
B. Stacked 24-row checkpointed encode vs three per-member 8-row encodes
   (the adaptive-stacking gate currently only engages when b % 8 != 0).
   MEASURED 2026-08-17: 883.2 ms and +0.9 GB peak vs 881.7 baseline — no
   win at full sublane rows; the b % 8 != 0 gate stays as is.

Run on the real TPU with nothing else on the host:
    python benchmarks/probe_512_full.py [base|xla|stack|all]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

H = W = 512
B = 8


from bench_common import (  # noqa: E402
    build_full_train_setup,
    fresh_full_state,
    make_triplet_batch,
    measure_rtt,
)


def build_and_time(label, rtt):
    from vae_tagger_tpu.losses.combined import LossConfig
    from vae_tagger_tpu.train.steps import make_full_steps

    rng = np.random.default_rng(0)
    vae, decoder, vp, dv, tx = build_full_train_setup(remat=True)
    state = fresh_full_state(vp, dv, tx)
    full_step, _ = make_full_steps(
        vae, decoder, LossConfig(use_focal_loss=True), use_simplified=True,
        compute_dtype=jnp.bfloat16, checkpoint_encode=True)

    batches = [make_triplet_batch(rng, B, H, W) for _ in range(2)]
    keys = jax.random.split(jax.random.key(0), 8)
    full_c = full_step.lower(state, batches[0], keys[0]).compile()
    flops = float(full_c.cost_analysis().get("flops", 0.0))
    mem = full_c.memory_analysis()
    peak = (mem.temp_size_in_bytes + mem.argument_size_in_bytes +
            mem.output_size_in_bytes - mem.alias_size_in_bytes) / 1e9
    state, m = full_c(state, batches[0], keys[0])
    jax.device_get(m["loss"])
    t0 = time.perf_counter()
    n = 4
    for i in range(n):
        state, m = full_c(state, batches[i % 2], keys[i])
        jax.device_get(m["loss"])
    dt = (time.perf_counter() - t0) / n - rtt
    print(f"{label}: {dt * 1e3:.1f} ms/step, MFU {flops / dt / 197e12:.3f}, "
          f"peak {peak:.2f} GB", flush=True)
    return dt


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rtt = measure_rtt()
    print(f"RTT {rtt * 1e3:.1f} ms", flush=True)

    from vae_tagger_tpu.ops import attention
    from vae_tagger_tpu.train import steps as steps_mod

    if which in ("all", "base"):
        build_and_time("default dispatch (flash attn in training at S=4096)",
                       rtt)
    if which in ("all", "xla"):
        orig_train = attention._FLASH_MIN_SEQ_TRAIN
        attention._FLASH_MIN_SEQ_TRAIN = 1 << 30
        build_and_time("XLA attention forced at S=4096", rtt)
        attention._FLASH_MIN_SEQ_TRAIN = orig_train
    if which in ("all", "stack"):
        # engage the stacked path for b % 8 == 0 as well
        orig = steps_mod._triplet_posterior

        def patched(vae, vae_params, batch, compute_dtype, checkpoint_encode):
            b = batch["anchor"].shape[0]
            if checkpoint_encode and b % 8 == 0:
                import jax as _jax

                @_jax.checkpoint
                def enc(p, px):
                    from vae_tagger_tpu.models.autoencoder_kl import (
                        AutoencoderKL as AK,
                    )
                    from vae_tagger_tpu.ops.image import normalize_uint8
                    x = normalize_uint8(px, compute_dtype)
                    post = vae.apply({"params": p}, x, method=AK.encode)
                    return post.mean, post.logvar

                images = jnp.concatenate(
                    [batch["anchor"], batch["positive"], batch["negative"]],
                    axis=0)
                mean, logvar = enc(vae_params, images)
                from vae_tagger_tpu.models.autoencoder_kl import (
                    DiagonalGaussian,
                )
                return DiagonalGaussian(mean=mean, logvar=logvar)
            return orig(vae, vae_params, batch, compute_dtype,
                        checkpoint_encode)

        steps_mod._triplet_posterior = patched
        build_and_time("stacked 24-row encode", rtt)
        steps_mod._triplet_posterior = orig


if __name__ == "__main__":
    main()
