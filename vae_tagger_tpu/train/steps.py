"""Jit-compiled training/eval step builders for the three trainers.

Each builder closes over the static model modules + loss config and returns
``(train_step, eval_step)`` jitted functions.  TPU-first design decisions
(vs the reference hot loops, SURVEY.md §3):

- the anchor/positive/negative triplet runs as ONE (3B, H, W, C) encoder
  call instead of three sequential forwards (train_full.py:209-211);
- the decodes of positive/negative — computed and discarded by the reference
  — are never built, and the anchor decode exists only when the loss uses it
  (XLA would DCE it anyway; we don't trace it);
- no per-step host sync: steps return scalar dicts that the loop reads
  asynchronously (the reference calls ``.item()`` every step,
  train_full.py:257);
- uint8 pixels normalize on device.

Batches may carry ``batch_mask`` padding (fixed shapes); the masked rows are
duplicates of real samples, so the batch mean is a slight reweighting on the
final partial batch only — same samples, compiled shapes.
"""

from __future__ import annotations

import contextlib
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..losses.combined import (
    LossConfig,
    classification_term,
    combined_loss,
    log_damped_kl,
    simplified_combined_loss,
)
from ..losses.metric_learning import triplet_loss
from ..ops.attention import training_trace
from ..models.autoencoder_kl import (
    AutoencoderKL,
    DiagonalGaussian,
    encode_scaled,
)
from ..ops.image import normalize_uint8, yuv420_to_rgb_uint8

# Stacked-triplet-encode pixel budget (padded_rows * H * W): above this the
# checkpointed encode stays per-member to bound HBM (1024x1024 bs1 measured
# 206MB over capacity stacked).  Measured fit points ON THE 16 GB v5e:
# 8x576x768 = 3.5M px peaks 6.0 GB, 16x576x768 = 7.1M px peaks 11.45 GB
# (0.690 MFU) — 7.2M px admits up to ~11.5 GB peaks with ~4 GB headroom.
# Peak memory is ~linear in pixels (measured slope 1.54 KB/px dominates the
# 0.55 GB intercept), so the budget scales linearly with whatever HBM the
# device actually reports (core/runtime.py::device_hbm_bytes — env override
# VAE_TAGGER_HBM_BYTES) instead of silently under-engaging on larger parts
# (a 95 GB v5p would otherwise lose the measured 2.15x stacking win).
_V5E_STACK_PX_LIMIT = 7_200_000


def stack_px_limit() -> int:
    """Pixel budget for the stacked checkpointed triplet encode, derived
    from this process's device memory.  Reproduces the measured 7.2M-px
    v5e decision exactly (16 GB -> 7.2M px) and scales linearly elsewhere;
    falls back to the v5e value when the backend reports no HBM size (CPU
    tests, exotic plugins)."""
    global _CACHED_PX_LIMIT
    if _CACHED_PX_LIMIT is None:
        from ..core.runtime import V5E_HBM_BYTES, device_hbm_bytes

        hbm = device_hbm_bytes()
        if hbm is None or abs(hbm - V5E_HBM_BYTES) < 0.1 * V5E_HBM_BYTES:
            # no report (this build host's tunneled backend returns no
            # memory_stats; verified on-chip), or a part within 10% of the
            # measured v5e: use the measured limit verbatim — PJRT backends
            # reserve slightly different fractions and a few-percent scale
            # must not perturb a decision calibrated on this exact part
            _CACHED_PX_LIMIT = _V5E_STACK_PX_LIMIT
        else:
            _CACHED_PX_LIMIT = int(_V5E_STACK_PX_LIMIT * hbm
                                   / V5E_HBM_BYTES)
    return _CACHED_PX_LIMIT


_CACHED_PX_LIMIT: Optional[int] = None

# bs1 non-checkpoint triplet encodes run per-member on TPU (the 3-row
# stacked encode measured ~2.1x slower per image; see _triplet_posterior).
# Module flag so benchmarks/bs1_step_ab.py can A/B the branch in-context.
_BS1_PER_MEMBER = True


def resolve_transfer_format(batch: dict) -> dict:
    """Reconstitute uint8 RGB from YUV 4:2:0 wire batches (trace-time).

    ``--transfer_format yuv420`` ships each image as ``<key>_y`` (B, H, W)
    + ``<key>_cbcr`` (B, 2, H/2, W/2) planar uint8 — half of RGB's bytes
    over the host->device link.  This converts those pairs back to uint8
    RGB under the original keys (BT.601 + round/clamp to the uint8 grid,
    ops/image.py::yuv420_to_rgb_uint8), so every step body downstream is
    byte-equivalent to the RGB path fed the device-converted pixels; XLA
    fuses the conversion into the first conv's input processing.  RGB
    batches pass through untouched."""
    if not any(k.endswith("_y") for k in batch):
        return batch
    batch = dict(batch)
    for key in ("pixel_values", "anchor", "positive", "negative"):
        if key + "_y" in batch:
            batch[key] = yuv420_to_rgb_uint8(batch.pop(key + "_y"),
                                             batch.pop(key + "_cbcr"))
    return batch


def _triplet_posterior(vae: AutoencoderKL, vae_params, batch, compute_dtype,
                       checkpoint_encode: bool) -> DiagonalGaussian:
    """Posterior over the concatenated (3B) anchor/positive/negative batch.

    checkpoint_encode=True additionally wraps the encode in jax.checkpoint
    (on top of per-block remat) so the backward holds at most one encode's
    state — this is what makes 1024px triplet training fit in a single
    v5e's 16GB HBM (measured: 20.2GB no remat, 16.0GB block remat, fits
    with this on).

    Adaptive stacking (round 3): per-member encodes at B < 8 run with
    sub-8 sublane rows — the measured ~3x per-pixel penalty (768x576 bs2:
    0.234 MFU per-member vs 0.671 at full rows).  When the sublane-padded
    3B stack still bounds memory (padded_rows * H * W <= stack_px_limit() —
    768x576 bs2 pads 6->8 and fits at 6.0 GB, bs4 at 11.45 GB; 1024x1024
    bs1 measured 206MB OVER HBM stacked, so it stays per-member), the
    checkpointed encode runs on the
    padded stack instead: one full-row encode, same O(one encode) backward
    state."""
    if not checkpoint_encode:
        if (_BS1_PER_MEMBER and batch["anchor"].shape[0] == 1
                and jax.default_backend() == "tpu"):
            # bs1: the 3-row stacked encode is pathological on v5e (slab
            # probe: 89.9 ms/image at 1024px vs 42.2 for N=1; 23.4 vs 10.9
            # at 512px) and the sublane pad gate below rightly blocks 3->8
            # padding (2.67x compute) — three sequential N=1 encodes win.
            def enc1(px):
                x = normalize_uint8(px, compute_dtype)
                return vae.apply({"params": vae_params}, x,
                                 method=AutoencoderKL.encode)
            parts = [enc1(batch[k])
                     for k in ("anchor", "positive", "negative")]
            return DiagonalGaussian(
                mean=jnp.concatenate([p.mean for p in parts], axis=0),
                logvar=jnp.concatenate([p.logvar for p in parts], axis=0))
        images = jnp.concatenate([batch["anchor"], batch["positive"],
                                  batch["negative"]], axis=0)
        rows = images.shape[0]
        # Sublane padding for the stacked 3B encode: the reference's
        # train_full.sh preset (bs 2) makes a 6-row batch, and off-multiple
        # batches measured ~3x lower per-pixel throughput on v5e.  Pad with
        # zero rows (GroupNorm is per-sample: pads cannot touch real rows;
        # their outputs are sliced off, so their gradients are zero) — but
        # only when the inflation stays <= 4/3 (3 rows -> 8 would nearly
        # triple compute and HBM, and 1024px bs1 goes through the
        # checkpoint_encode branch below anyway).
        padded = -(-rows // 8) * 8
        pad_rows = padded - rows
        if (jax.default_backend() == "tpu" and pad_rows
                and padded * 3 <= rows * 4):
            images = jnp.concatenate(
                [images, jnp.zeros((pad_rows, *images.shape[1:]),
                                   images.dtype)], axis=0)
        x = normalize_uint8(images, compute_dtype)
        post = vae.apply({"params": vae_params}, x,
                         method=AutoencoderKL.encode)
        if images.shape[0] != rows:
            post = DiagonalGaussian(mean=post.mean[:rows],
                                    logvar=post.logvar[:rows])
        return post

    @jax.checkpoint
    def enc(p, px):
        x = normalize_uint8(px, compute_dtype)
        post = vae.apply({"params": p}, x, method=AutoencoderKL.encode)
        return post.mean, post.logvar

    b, h, w = (batch["anchor"].shape[0], batch["anchor"].shape[1],
               batch["anchor"].shape[2])
    rows = 3 * b
    padded = -(-rows // 8) * 8
    # same inflation gate as the non-checkpoint branch: padding 3 rows to 8
    # would nearly triple compute — not worth full sublanes
    if (b % 8 and padded * h * w <= stack_px_limit()
            and padded * 3 <= rows * 4):
        # stacked + sublane-padded encode under ONE checkpoint: full-row
        # throughput, backward still holds one encode's state
        images = jnp.concatenate([batch["anchor"], batch["positive"],
                                  batch["negative"]], axis=0)
        if jax.default_backend() == "tpu" and padded != rows:
            images = jnp.concatenate(
                [images, jnp.zeros((padded - rows, *images.shape[1:]),
                                   images.dtype)], axis=0)
        mean, logvar = enc(vae_params, images)
        return DiagonalGaussian(mean=mean[:rows], logvar=logvar[:rows])

    parts = [enc(vae_params, batch[k])
             for k in ("anchor", "positive", "negative")]
    return DiagonalGaussian(
        mean=jnp.concatenate([m for m, _ in parts], axis=0),
        logvar=jnp.concatenate([lv for _, lv in parts], axis=0))


def _kernel_ctx(force_xla: bool, training: bool, spatial_mesh=None,
                spatial_axis: str = "model"):
    """Trace-time kernel-dispatch context for a step body.

    force_xla=True routes every op to the XLA path — required under
    spatial (height-sharded) parallelism, where GSPMD cannot partition
    hand-written Pallas kernels.  When the spatial MESH is also given, the
    mid-block attention gets the one exception: a shard_map form that
    all-gathers K/V over the spatial axis and runs the Pallas flash kernel
    on local q rows whenever the local sequence clears the measured
    crossover (ops/attention.py::spatial_attention_trace — entered BEFORE
    the xla override so kernel capability is captured).  Otherwise
    gradient-carrying traces use training_trace() (the measured training
    flash-attention crossover) and eval traces keep the forward policy."""
    if force_xla:
        from ..ops import backend
        from ..ops.attention import spatial_attention_trace

        stack = contextlib.ExitStack()
        if training:
            stack.enter_context(training_trace())
        if spatial_mesh is not None:
            stack.enter_context(spatial_attention_trace(
                spatial_mesh, spatial_axis=spatial_axis, batch_axis=None))
        stack.enter_context(backend.backend("xla"))
        return stack
    return training_trace() if training else contextlib.nullcontext()


def _decoder_forward(decoder, params, batch_stats, latents, *, train, rng):
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
    if train:
        out = decoder.apply(variables, latents, deterministic=False,
                            rngs={"dropout": rng},
                            mutable=["batch_stats"] if batch_stats is not None
                            else False)
        if batch_stats is not None:
            logits, mutated = out
            return logits, mutated["batch_stats"]
        return out, None
    logits = decoder.apply(variables, latents, deterministic=True)
    return logits, batch_stats


# --------------------------------------------------------------------------
# train_decoder: frozen VAE, classifier-only (train_decoder.py:173-263)
# --------------------------------------------------------------------------

def make_decoder_steps(vae: AutoencoderKL, decoder, cfg: LossConfig,
                       cb_weights=None, compute_dtype=jnp.float32,
                       force_xla_kernels: bool = False, spatial_mesh=None):
    def encode(vae_params, pixels_uint8):
        # the VAE encode is the only long-sequence/kernel-bearing region of
        # a decoder step (the head's MHSA is 64 tokens, XLA path always)
        with _kernel_ctx(force_xla_kernels, training=False,
                         spatial_mesh=spatial_mesh):
            x = normalize_uint8(pixels_uint8, compute_dtype)
            posterior = vae.apply({"params": vae_params}, x,
                                  method=AutoencoderKL.encode)
            return jax.lax.stop_gradient(
                encode_scaled(posterior.mode(),
                              vae.config)).astype(compute_dtype)

    def _train_body(state, latents, labels, rng):
        def loss_fn(params):
            logits, new_stats = _decoder_forward(
                decoder, params, state.batch_stats, latents,
                train=True, rng=rng)
            loss = classification_term(cfg, logits, labels, cb_weights)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads, new_batch_stats=new_stats)
        return state, {"loss": loss}

    def _eval_body(state, latents, labels):
        logits, _ = _decoder_forward(decoder, state.params,
                                     state.batch_stats, latents,
                                     train=False, rng=None)
        loss = classification_term(cfg, logits, labels, cb_weights)
        probs = jax.nn.sigmoid(logits.astype(jnp.float32))
        return {"loss": loss, "probs": probs}

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, vae_params, batch, rng):
        batch = resolve_transfer_format(batch)
        latents = encode(vae_params, batch["pixel_values"])
        return _train_body(state, latents, batch["labels"], rng)

    @jax.jit
    def eval_step(state, vae_params, batch):
        batch = resolve_transfer_format(batch)
        latents = encode(vae_params, batch["pixel_values"])
        return _eval_body(state, latents, batch["labels"])

    # latent-direct variants for --cache_latents (the frozen VAE makes
    # latents a pure function of the image; epochs >= 2 skip the encode,
    # which is ~90% of the decoder-train step)
    @partial(jax.jit, donate_argnums=(0,))
    def train_step_latents(state, latents, labels, rng):
        return _train_body(state, latents, labels, rng)

    @jax.jit
    def eval_step_latents(state, latents, labels):
        return _eval_body(state, latents, labels)

    train_step.encode = jax.jit(encode)
    # batch-dict form for --cache_latents (handles both wire formats)
    train_step.encode_batch = jax.jit(
        lambda p, pix: encode(p,
                              resolve_transfer_format(pix)["pixel_values"]))
    train_step.from_latents = train_step_latents
    eval_step.from_latents = eval_step_latents
    return train_step, eval_step


# --------------------------------------------------------------------------
# train_vae: VAE-only triplet training (train_vae.py:119-213)
# --------------------------------------------------------------------------

def make_vae_steps(vae: AutoencoderKL, cfg: LossConfig,
                   use_simplified: bool = True,
                   compute_dtype=jnp.float32,
                   checkpoint_encode: bool = False,
                   force_xla_kernels: bool = False, spatial_mesh=None):
    def forward_losses(vae_params, batch, rng):
        batch = resolve_transfer_format(batch)
        rng_recon, rng_trip = jax.random.split(rng)
        b = batch["anchor"].shape[0]
        posterior = _triplet_posterior(vae, vae_params, batch, compute_dtype,
                                       checkpoint_encode)
        z = posterior.sample(rng_trip)
        z_a, z_p, z_n = z[:b], z[b:2 * b], z[2 * b:]

        # the reconstruction decodes its OWN posterior draw, independent of
        # the triplet draw (train_vae.py:131-146: model(anchor) samples
        # internally, then .sample() again for the triplet).  Sharing one
        # draw measurably destabilizes training: the posterior drifts from
        # the prior (log-damped KL 12 vs 0.6 by epoch 2) and the held-out
        # objective rises instead of falling
        # (benchmarks/vae_dynamics_probe.py).
        z_recon = DiagonalGaussian(
            mean=posterior.mean[:b],
            logvar=posterior.logvar[:b]).sample(rng_recon)
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
        if use_simplified:
            # KL monitored, not optimized (train_vae.py:139-156)
            total = (cfg.reconstruction_weight * recon_loss
                     + cfg.triplet_weight * trip)
        else:
            total = (cfg.reconstruction_weight * recon_loss
                     + cfg.kl_weight * kl_loss
                     + cfg.triplet_weight * trip)
        return total, {"loss": total, "reconstruction_loss": recon_loss,
                       "kl_loss": kl_loss, "triplet_loss": trip}

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, rng):
        # trace-time context: the VAE mid-block attention backward favors
        # the flash kernel one bucket earlier than forward-only dispatch
        # (or _kernel_ctx forces the XLA path under spatial parallelism)
        with _kernel_ctx(force_xla_kernels, training=True,
                         spatial_mesh=spatial_mesh):
            (_, metrics), grads = jax.value_and_grad(
                lambda p: forward_losses(p, batch, rng), has_aux=True
            )(state.params)
        state = state.apply_gradients(grads)
        return state, metrics

    @jax.jit
    def eval_step(state, batch, rng):
        with _kernel_ctx(force_xla_kernels, training=False,
                         spatial_mesh=spatial_mesh):
            _, metrics = forward_losses(state.params, batch, rng)
        return metrics

    return train_step, eval_step


# --------------------------------------------------------------------------
# train_full: end-to-end VAE + decoder (train_full.py:195-255)
# --------------------------------------------------------------------------

def make_full_steps(vae: AutoencoderKL, decoder, cfg: LossConfig,
                    use_simplified: bool = True, adaptive_module=None,
                    cb_weights=None, compute_dtype=jnp.float32,
                    checkpoint_encode: bool = False,
                    force_xla_kernels: bool = False, spatial_mesh=None):
    """Params tree: {'vae': ..., 'decoder': ..., ['adaptive': ...]}."""

    def forward_losses(params, batch_stats, batch, rng, *, train):
        batch = resolve_transfer_format(batch)
        rng_sample, rng_dropout = jax.random.split(rng)
        b = batch["anchor"].shape[0]
        posterior = _triplet_posterior(vae, params["vae"], batch,
                                       compute_dtype, checkpoint_encode)
        z = posterior.sample(rng_sample)
        z_a, z_p, z_n = z[:b], z[b:2 * b], z[2 * b:]

        # classification input: scaled/shifted anchor mode, no grad to VAE
        # (train_full.py:217-224)
        latents = jax.lax.stop_gradient(
            encode_scaled(posterior.mean[:b], vae.config)
        ).astype(compute_dtype)
        logits, new_stats = _decoder_forward(
            decoder, params["decoder"], batch_stats, latents,
            train=train, rng=rng_dropout)

        labels = batch["labels"]
        positive_labels = batch.get("positive_labels", labels)

        # loss orchestration lives in losses/combined.py (single source of
        # truth, exercised by the direct-reference parity tests)
        if use_simplified:
            total, loss_dict = simplified_combined_loss(
                cfg, z_a, z_p, z_n,
                classification_logits=logits,
                classification_targets=labels,
                anchor_labels=labels,
                positive_labels=positive_labels,
                cb_weights=cb_weights)
        else:
            # independent anchor draw for the reconstruction term, as in
            # the reference (train_full.py:209-213: vae_model(anchor)
            # samples internally, .sample() again for the triplet); see
            # make_vae_steps for the measured shared-draw instability
            rng_recon = jax.random.fold_in(rng_sample, 1)
            z_recon = DiagonalGaussian(
                mean=posterior.mean[:b],
                logvar=posterior.logvar[:b]).sample(rng_recon)
            recon_a = vae.apply({"params": params["vae"]}, z_recon,
                                method=AutoencoderKL.decode)
            anchor_f32 = normalize_uint8(batch["anchor"], jnp.float32)
            kl = posterior.kl()
            adaptive_fn = None
            if cfg.use_adaptive_weights and adaptive_module is not None:
                adaptive_fn = lambda losses: adaptive_module.apply(
                    {"params": params["adaptive"]}, losses)
            total, loss_dict = combined_loss(
                cfg, recon_a, anchor_f32,
                kl[:b], kl[b:2 * b], kl[2 * b:],
                z_a, z_p, z_n, logits, labels,
                anchor_labels=labels, positive_labels=positive_labels,
                cb_weights=cb_weights, adaptive_weights_fn=adaptive_fn)

        metrics = {k: v for k, v in loss_dict.items()
                   if k not in ("total_loss", "weights")}
        metrics["loss"] = total
        probs = jax.nn.sigmoid(logits.astype(jnp.float32))
        return total, (metrics, new_stats, probs)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, rng):
        # trace-time context: see ops/attention.py::training_trace — the
        # attention backward shifts the measured flash crossover to S>=4096
        # (or _kernel_ctx forces the XLA path under spatial parallelism)
        with _kernel_ctx(force_xla_kernels, training=True,
                         spatial_mesh=spatial_mesh):
            (_, (metrics, new_stats, _)), grads = jax.value_and_grad(
                lambda p: forward_losses(p, state.batch_stats, batch, rng,
                                         train=True),
                has_aux=True)(state.params)
        state = state.apply_gradients(grads, new_batch_stats=new_stats)
        return state, metrics

    @jax.jit
    def eval_step(state, batch, rng):
        with _kernel_ctx(force_xla_kernels, training=False,
                         spatial_mesh=spatial_mesh):
            _, (metrics, _, probs) = forward_losses(
                state.params, state.batch_stats, batch, rng, train=False)
        metrics["probs"] = probs
        return metrics

    return train_step, eval_step
