#!/usr/bin/env python
"""Why does train_vae's posterior drift from the prior when the reference's
doesn't?  (KL monitor: ours log1p(kl/1e4) reaches 8-10 by epoch 2-3, the
reference's stays 0.02-0.86 on the identical 64px head-to-head.)

The one structural difference between the two train steps is sample
sharing: the reference decodes an INDEPENDENT posterior draw for the
reconstruction term and draws fresh samples for the triplet term
(/root/reference/train_vae.py:131-146: model(anchor) samples internally,
then posterior.sample() again), while ours reuses ONE draw for both.
This probe trains the 64px parity config (same seed VAE, same dataset,
same flags as benchmarks/ref_accuracy_cpu.py --trainer vae) under:

  A. shared   — production make_vae_steps (one sample for recon + triplet)
  B. decoupled — reference structure (recon on draw 1, triplet on draw 2)

and records per-epoch train recon/triplet/KL + a FIXED-rng val objective.
Run on the scrubbed CPU backend:
  env PYTHONPATH=/root/repo PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python benchmarks/vae_dynamics_probe.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def build_steps(vae, cfg, decoupled: bool):
    """Variant A (decoupled=False) delegates to the production builder;
    variant B re-implements forward_losses with the reference's two-draw
    structure (train_vae.py:131-146) and is otherwise identical."""
    from vae_tagger_tpu.losses.combined import log_damped_kl
    from vae_tagger_tpu.losses.metric_learning import triplet_loss
    from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL
    from vae_tagger_tpu.ops.image import normalize_uint8
    from vae_tagger_tpu.train.steps import _triplet_posterior, make_vae_steps

    if not decoupled:
        return make_vae_steps(vae, cfg, use_simplified=True)

    def forward_losses(vae_params, batch, rng):
        rng1, rng2 = jax.random.split(rng)
        b = batch["anchor"].shape[0]
        posterior = _triplet_posterior(vae, vae_params, batch, jnp.float32,
                                       False)
        # draw 1: reconstruction; draw 2: triplet (reference structure)
        z_recon = posterior.sample(rng1)[:b]
        z = posterior.sample(rng2)
        z_a, z_p, z_n = z[:b], z[b:2 * b], z[2 * b:]

        recon_a = vae.apply({"params": vae_params}, z_recon,
                            method=AutoencoderKL.decode)
        anchor_f32 = normalize_uint8(batch["anchor"], jnp.float32)
        recon_loss = jnp.mean(jnp.square(
            recon_a.astype(jnp.float32) - anchor_f32))

        kl = posterior.kl()
        kl_loss = log_damped_kl(kl[:b], kl[b:2 * b], kl[2 * b:])
        trip = triplet_loss(z_a, z_p, z_n, batch["labels"],
                            batch.get("positive_labels", batch["labels"]),
                            margin=cfg.triplet_margin,
                            similarity_type=cfg.similarity_type)
        total = (cfg.reconstruction_weight * recon_loss
                 + cfg.triplet_weight * trip)
        return total, {"loss": total, "reconstruction_loss": recon_loss,
                       "kl_loss": kl_loss, "triplet_loss": trip}

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, rng):
        (_, metrics), grads = jax.value_and_grad(
            lambda p: forward_losses(p, batch, rng), has_aux=True
        )(state.params)
        state = state.apply_gradients(grads)
        return state, metrics

    @jax.jit
    def eval_step(state, batch, rng):
        _, metrics = forward_losses(state.params, batch, rng)
        return metrics

    return train_step, eval_step


def run_variant(name, decoupled, ws, epochs, lr, seed):
    import optax

    from vae_tagger_tpu.data.dataset import TaggedImageDataset
    from vae_tagger_tpu.data.loader import DataLoader, train_val_split
    from vae_tagger_tpu.infer.engine import load_vae_bundle
    from vae_tagger_tpu.losses.combined import LossConfig
    from vae_tagger_tpu.train.state import TrainState, build_optimizer

    vae, params = load_vae_bundle(
        os.path.join(ws, "seed_vae", "diffusion_pytorch_model.safetensors"),
        os.path.join(ws, "seed_vae", "config.json"))
    ds = TaggedImageDataset(
        json_path=os.path.join(ws, "ds", "data.json"),
        tags_csv_path=os.path.join(ws, "ds", "tags.csv"),
        resolution=64, return_triplets=True, seed=seed)
    train_idx, val_idx = train_val_split(len(ds), 0.1, seed=seed or 42)
    train_loader = DataLoader(ds, batch_size=4, shuffle=True, seed=seed,
                              num_workers=0, indices=train_idx)
    val_loader = DataLoader(ds, batch_size=4, shuffle=False, seed=seed,
                            num_workers=0, indices=val_idx)

    from vae_tagger_tpu.train.schedule import build_lr_schedule

    cfg = LossConfig(reconstruction_weight=0.01, triplet_weight=1.0,
                     triplet_margin=1.0, similarity_type="cosine")
    total_steps = epochs * len(train_loader)
    schedule = build_lr_schedule("cosine", lr, 20, total_steps)
    tx = build_optimizer(schedule, 1e-6, 1.0, 1)
    state = TrainState.create(jax.tree.map(jnp.array, params), tx)

    train_step, eval_step = build_steps(vae, cfg, decoupled)
    base_rng = jax.random.key(seed)
    hist = {"recon": [], "triplet": [], "kl": [], "val": []}
    gstep = 0
    for epoch in range(epochs):
        ds.set_epoch(epoch)
        acc = {k: [] for k in ("reconstruction_loss", "triplet_loss",
                               "kl_loss")}
        for batch in train_loader:
            batch.pop("global_real_count", None)
            state, metrics = train_step(
                state, batch, jax.random.fold_in(base_rng, gstep))
            m = jax.device_get(metrics)
            for k in acc:
                acc[k].append(float(m[k]))
            gstep += 1
        # fixed-rng val: same triplets (epoch pinned), same noise each
        # epoch, so the trajectory is a paired comparison
        ds.set_epoch(10_000)
        vals = []
        for i, batch in enumerate(val_loader):
            batch.pop("global_real_count", None)
            m = jax.device_get(eval_step(
                state, batch, jax.random.fold_in(base_rng, 77_000 + i)))
            vals.append(float(m["loss"]))
        ds.set_epoch(epoch)
        hist["recon"].append(round(float(np.mean(
            acc["reconstruction_loss"])), 4))
        hist["triplet"].append(round(float(np.mean(acc["triplet_loss"])), 4))
        hist["kl"].append(round(float(np.mean(acc["kl_loss"])), 4))
        hist["val"].append(round(float(np.mean(vals)), 4))
        print(f"[{name}] epoch {epoch}: recon {hist['recon'][-1]} "
              f"triplet {hist['triplet'][-1]} kl(log-damped) "
              f"{hist['kl'][-1]} val(fixed-rng) {hist['val'][-1]}",
              flush=True)
    return hist


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", default=os.path.join(
        REPO, "benchmarks", "_acc_runs", "parity64_vae"))
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=os.path.join(
        REPO, "benchmarks", "vae_dynamics_probe.json"))
    args = ap.parse_args()

    t0 = time.perf_counter()
    out = {"config": {"epochs": args.epochs, "lr": args.lr,
                      "seed": args.seed, "workspace": args.workspace}}
    for name, dec in (("shared", False), ("decoupled", True)):
        out[name] = run_variant(name, dec, args.workspace, args.epochs,
                                args.lr, args.seed)
    out["wall_s"] = round(time.perf_counter() - t0, 1)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
