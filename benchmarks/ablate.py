#!/usr/bin/env python
"""Kernel ablation for the headline encode+tag forward (bench.py workload).

Measures sustained img/s with individual Pallas kernels selectively disabled
(flash attention stays on in all configs — a full-XLA S=16384 attention would
materialize an (8,16384,16384) fp32 score tensor and OOM the chip):

  default      — dispatch as shipped (per-op auto policy, ops/backend.py)
  full         — ALL Pallas kernels forced on (backend "pallas")
  no_fused_conv— all kernels on except fused conv [chunked GN exposed]
  round1       — XLA convs + whole-sample GN + flash attn [round-1 config]
  no_chunked_gn— fused conv on; oversize GN sites fall back to XLA
  no_gn_kernels— fused conv on; ALL standalone GN sites to XLA

Run on the real TPU: `python benchmarks/ablate.py --configs full,no_fused_conv`
(one or two configs per process keeps relay compiles bounded).
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

RESOLUTION = 1024
BATCH = 8
NUM_CLASSES = 1000
REPS = 10


def build_forward():
    from vae_tagger_tpu.core.config import default_flux_vae_config
    from vae_tagger_tpu.core.precision import BF16
    from vae_tagger_tpu.infer.engine import build_decoder
    from vae_tagger_tpu.models.autoencoder_kl import (
        AutoencoderKL,
        encode_scaled,
    )
    from vae_tagger_tpu.ops.image import normalize_uint8

    cfg = default_flux_vae_config()
    vae = AutoencoderKL(cfg, dtype=jnp.bfloat16)
    decoder = build_decoder(NUM_CLASSES, use_attention=True,
                            latent_channels=cfg.latent_channels, policy=BF16)
    vae_params = jax.jit(vae.init)(
        {"params": jax.random.key(0)}, jnp.zeros((1, 256, 256, 3)),
        jax.random.key(1))["params"]
    dec_vars = jax.jit(decoder.init, static_argnames=("deterministic",))(
        {"params": jax.random.key(2)}, jnp.zeros((1, 32, 32, 16)),
        deterministic=True)

    def forward(vp, dv, px):
        x = normalize_uint8(px, jnp.bfloat16)
        posterior = vae.apply({"params": vp}, x,
                              method=AutoencoderKL.encode)
        latents = encode_scaled(posterior.mode(), cfg)
        logits = decoder.apply(dv, latents.astype(jnp.bfloat16),
                               deterministic=True)
        return jax.nn.sigmoid(logits.astype(jnp.float32))

    return forward, vae_params, dec_vars


class _patch:
    def __init__(self, obj, name, value):
        self.obj, self.name, self.value = obj, name, value

    def __enter__(self):
        self.saved = getattr(self.obj, self.name)
        setattr(self.obj, self.name, self.value)

    def __exit__(self, *exc):
        setattr(self.obj, self.name, self.saved)


def ablation_patches(config):
    from vae_tagger_tpu.ops import backend
    from vae_tagger_tpu.ops.pallas import conv_fused, groupnorm_silu

    if config == "default":
        return []
    # every other config starts from "all kernels on" and patches some out
    backend.set_backend("pallas")
    if config == "full":
        return []
    if config == "no_fused_conv":
        return [_patch(conv_fused, "plan_fused_conv",
                       lambda *a, **k: None)]
    if config == "round1":  # fused conv + chunked GN both absent in r1
        return [_patch(conv_fused, "plan_fused_conv",
                       lambda *a, **k: None),
                _patch(groupnorm_silu, "_chunk_tile", lambda *a, **k: 0)]
    if config == "no_chunked_gn":
        return [_patch(groupnorm_silu, "_chunk_tile", lambda *a, **k: 0)]
    if config == "no_gn_kernels":
        return [_patch(groupnorm_silu, "_chunk_tile", lambda *a, **k: 0),
                _patch(groupnorm_silu, "fits_in_vmem",
                       lambda *a, **k: False)]
    if config.startswith("fused_h"):  # fused conv ONLY at height == N
        want = int(config[len("fused_h"):])
        orig = conv_fused.plan_fused_conv

        def only_h(h, *a, **k):
            return orig(h, *a, **k) if h == want else None

        return [_patch(conv_fused, "plan_fused_conv", only_h),
                _patch(groupnorm_silu, "_chunk_tile", lambda *a, **k: 0)]
    raise SystemExit(f"unknown config {config}")


def measure(config):
    from vae_tagger_tpu.ops import backend

    forward, vae_params, dec_vars = build_forward()

    prev_backend = backend.get_backend()
    patches = ablation_patches(config)
    for p in patches:
        p.__enter__()
    try:
        # fresh closure per config -> separate jit cache entry
        @jax.jit
        def chained(vp, dv, buf):
            def body(i, acc):
                px = jax.lax.dynamic_index_in_dim(buf, i, 0, keepdims=False)
                return acc + jnp.sum(forward(vp, dv, px))
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

        buf = jnp.asarray(np.random.default_rng(0).integers(
            0, 256, size=(REPS, BATCH, RESOLUTION, RESOLUTION, 3),
            dtype=np.uint8))
        jax.device_get(chained(vae_params, dec_vars, buf))  # warm
        t0 = time.perf_counter()
        jax.device_get(chained(vae_params, dec_vars, buf))
        dt = (time.perf_counter() - t0) / REPS
    finally:
        for p in reversed(patches):
            p.__exit__()
        backend.set_backend(prev_backend)
    return {"config": config, "ms_per_batch": round(dt * 1e3, 1),
            "images_per_sec": round(BATCH / dt, 1)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", default="full,no_fused_conv")
    args = p.parse_args()
    for c in args.configs.split(","):
        print(json.dumps(measure(c)))


if __name__ == "__main__":
    main()
