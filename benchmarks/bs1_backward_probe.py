#!/usr/bin/env python
"""Segment the 1024px bs1 remat train_full step: where do the ~880 ms go?

The honest corrected figure (report.json::train_full_1024px_batch1_remat)
is 882 ms/step at 0.399 MFU.  Forward work is ~3 per-member encodes
(42 ms each, slab probe) + a small head; this probe times the pieces:

  A. eval-mode forward (3 encodes + head + losses, no grad)
  B. value_and_grad of ONE checkpointed member encode (sum-of-mean loss)
  C. the full train step (reference point, per-dispatch − RTT)
  D. optimizer apply alone (dummy grads, donated state)

so C ≈ A + 3·(B − fwd_encode) + D tells us whether the backward conv
rate at N=1, the remat recompute, or something unaccounted dominates.

Run on the real TPU (plain python), never concurrently with pytest.
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

from bench_common import (
    build_full_train_setup,
    fresh_full_state,
    make_triplet_batch,
    measure_rtt,
)

RNG = np.random.default_rng(0)
H = W = 1024


def timed_calls(fn, args_list, rtt, reps=3):
    out = fn(*args_list[0])
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(*args_list[i % len(args_list)])
        jax.device_get(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / reps - rtt


def main():
    import optax

    from vae_tagger_tpu.losses.combined import LossConfig
    from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL
    from vae_tagger_tpu.ops.image import normalize_uint8
    from vae_tagger_tpu.train.steps import make_full_steps

    rtt = measure_rtt()
    print(f"rtt {rtt * 1e3:.1f} ms", flush=True)
    res = {"rtt_ms": round(rtt * 1e3, 1)}

    vae, decoder, vp, dv, tx = build_full_train_setup(remat=True)
    full_step, eval_step = make_full_steps(
        vae, decoder, LossConfig(use_focal_loss=True), use_simplified=True,
        compute_dtype=jnp.bfloat16, checkpoint_encode=True)

    batches = [make_triplet_batch(RNG, 1, H, W) for _ in range(2)]
    keys = list(jax.random.split(jax.random.key(0), 4))

    def fresh_state():
        return fresh_full_state(vp, dv, tx)

    # B: grad of one checkpointed member encode
    @jax.jit
    def enc_grad(p, px):
        @jax.checkpoint
        def enc(p, px):
            x = normalize_uint8(px, jnp.bfloat16)
            post = vae.apply({"params": p}, x, method=AutoencoderKL.encode)
            return jnp.sum(post.mean.astype(jnp.float32))
        return jax.grad(enc)(p, px)

    @jax.jit
    def enc_fwd(p, px):
        x = normalize_uint8(px, jnp.bfloat16)
        post = vae.apply({"params": p}, x, method=AutoencoderKL.encode)
        return jnp.sum(post.mean.astype(jnp.float32))

    px = [b["anchor"] for b in batches]
    res["enc_fwd_ms"] = round(
        timed_calls(enc_fwd, [(vp, px[0]), (vp, px[1])], rtt) * 1e3, 1)
    print("enc_fwd", res["enc_fwd_ms"], flush=True)
    res["enc_grad_ms"] = round(
        timed_calls(enc_grad, [(vp, px[0]), (vp, px[1])], rtt) * 1e3, 1)
    print("enc_grad", res["enc_grad_ms"], flush=True)

    # A: eval-mode forward of the full loss
    state = fresh_state()
    res["eval_fwd_ms"] = round(timed_calls(
        lambda b, k: eval_step(state, b, k),
        [(batches[0], keys[0]), (batches[1], keys[1])], rtt) * 1e3, 1)
    print("eval_fwd", res["eval_fwd_ms"], flush=True)

    # D: optimizer apply alone (dummy unit grads, non-donated state copy)
    grads = jax.tree.map(jnp.ones_like, state.params)

    @jax.jit
    def opt_only(params, opt_state):
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt

    params_c = jax.tree.map(jnp.array, state.params)
    res["opt_ms"] = round(timed_calls(
        opt_only, [(params_c, state.opt_state)], rtt) * 1e3, 1)
    print("opt", res["opt_ms"], flush=True)

    # C: the full train step
    state = fresh_state()
    comp = full_step.lower(state, batches[0], keys[0]).compile()
    state, m = comp(state, batches[0], keys[0])
    jax.device_get(m["loss"])
    t0 = time.perf_counter()
    n = 4
    for i in range(n):
        state, m = comp(state, batches[i % 2], keys[i])
        jax.device_get(m["loss"])
    res["full_step_ms"] = round(
        ((time.perf_counter() - t0) / n - rtt) * 1e3, 1)
    print("full_step", res["full_step_ms"], flush=True)

    res["derived"] = {
        "enc_bwd_only_ms": round(res["enc_grad_ms"] - res["enc_fwd_ms"], 1),
        "three_enc_grads_ms": round(3 * res["enc_grad_ms"], 1),
        "unaccounted_ms": round(
            res["full_step_ms"]
            - 3 * res["enc_grad_ms"]
            - (res["eval_fwd_ms"] - 3 * res["enc_fwd_ms"])
            - res["opt_ms"], 1),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
