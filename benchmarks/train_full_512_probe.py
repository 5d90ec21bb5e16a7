#!/usr/bin/env python
"""train_full step probe at 512px batch 2 (the reference preset's shape).

Measures the triplet train step whose stacked encode batch is 3B=6 rows —
the case the in-step sublane padding (train/steps.py::_triplet_posterior)
targets.  Run on the real TPU; steps are chained inside ONE compiled scan
over DISTINCT batches and synced once (per-dispatch timing pays the
relay's ~100ms RTT per step — a large fraction of a ~160ms step).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vae_tagger_tpu.core.config import default_flux_vae_config
from vae_tagger_tpu.infer.engine import build_decoder
from vae_tagger_tpu.losses.combined import LossConfig
from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL
from vae_tagger_tpu.train.state import TrainState, build_optimizer
from vae_tagger_tpu.train.steps import make_full_steps

RNG = np.random.default_rng(0)
B = 2
RES = 512


def main():
    cfg = default_flux_vae_config()
    vae = AutoencoderKL(cfg, dtype=jnp.bfloat16)
    decoder = build_decoder(1000, use_attention=True, latent_channels=16)
    vp = jax.jit(vae.init)({"params": jax.random.key(0)},
                           jnp.zeros((1, 256, 256, 3)), jax.random.key(1))["params"]
    dv = jax.jit(decoder.init, static_argnames=("deterministic",))(
        {"params": jax.random.key(2)}, jnp.zeros((1, 64, 64, 16)),
        deterministic=True)

    tx = build_optimizer(optax.constant_schedule(1e-4), 1e-6, 1.0, 1)
    params = {"vae": vp, "decoder": dv["params"]}
    state = TrainState.create(params, tx, batch_stats=dv.get("batch_stats"))
    step, _ = make_full_steps(vae, decoder, LossConfig(use_focal_loss=True),
                              use_simplified=True, compute_dtype=jnp.bfloat16)

    def mk():
        b = {k: jnp.asarray(RNG.integers(0, 256, (B, RES, RES, 3),
                                         dtype=np.uint8))
             for k in ("anchor", "positive", "negative")}
        b["labels"] = jnp.asarray(
            (RNG.random((B, 1000)) > 0.95).astype(np.float32))
        b["positive_labels"] = b["labels"]
        return b

    n = 4
    batches = jax.tree.map(lambda *xs: jnp.stack(xs), *[mk() for _ in range(n)])
    keys = jax.random.split(jax.random.key(0), n)

    @jax.jit
    def chain(state, batches, keys):
        def body(st, xs):
            b, key = xs
            st, m = step(st, b, key)
            return st, m["loss"]
        return jax.lax.scan(body, state, (batches, keys))

    st2, losses = chain(state, batches, keys)
    jax.device_get(losses)
    t0 = time.perf_counter()
    st2, losses = chain(state, batches, keys)
    jax.device_get(losses)
    dt = (time.perf_counter() - t0) / n
    print(json.dumps({"ms_per_step": round(dt * 1e3, 1),
                      "images_per_sec": round(B / dt, 1)}))


if __name__ == "__main__":
    main()
