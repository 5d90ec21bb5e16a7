#!/usr/bin/env python
"""Headline benchmark: VAE encode + tag throughput at 1024px on one chip.

Matches the BASELINE.json metric ("images/sec/chip VAE encode+tag at
1024px"): the full FLUX AutoencoderKL encoder (83.8M params) + the attention
tagger head (1000 classes), bf16 compute, batch 8, uint8 inputs normalized
on device, Pallas flash attention in the 16,384-token mid block.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: ratio against the CPU fp32 single-image path measured with the
same models on this host (0.0260 images/sec at 1024px — measured at 256px and
scaled by the 16x pixel/FLOP ratio, since the 1-core CPU host needs ~40s per
256px image; the PyTorch reference itself cannot run here, diffusers is not
installed).  The driver-set north star is >=5x CPU baseline.

Timing note: on the tunneled 'axon' backend, block_until_ready returns
early; jax.device_get is used to force full synchronization each iteration.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

CPU_BASELINE_IPS = 0.0260  # images/sec @1024px, fp32, this host (see above)
RESOLUTION = 1024
BATCH = 8
NUM_CLASSES = 1000
WARMUP = 2
ITERS = 10


def main():
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

    @jax.jit
    def encode_tag(vp, dv, px):
        x = normalize_uint8(px, jnp.bfloat16)
        posterior = vae.apply({"params": vp}, x,
                              method=AutoencoderKL.encode)
        latents = encode_scaled(posterior.mode(), cfg)
        logits = decoder.apply(dv, latents.astype(jnp.bfloat16),
                               deterministic=True)
        return jax.nn.sigmoid(logits.astype(jnp.float32))

    px = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, size=(BATCH, RESOLUTION, RESOLUTION, 3), dtype=np.uint8))

    for _ in range(WARMUP):
        jax.device_get(encode_tag(vae_params, dec_vars, px))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = jax.device_get(encode_tag(vae_params, dec_vars, px))
    dt = (time.perf_counter() - t0) / ITERS
    ips = BATCH / dt

    print(json.dumps({
        "metric": "images/sec/chip VAE encode+tag @1024px bf16 batch8",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / CPU_BASELINE_IPS, 1),
    }))


if __name__ == "__main__":
    main()
