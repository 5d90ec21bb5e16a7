"""Attention numerics.

The one long-sequence attention in the whole model is the VAE mid-block: a
single-head, 512-dim self-attention over the full latent grid — 16,384 tokens
at 1024px input (SURVEY.md §5).  The reference materializes the full SxS score
matrix inside diffusers and offers xformers as an opt-in; here the Pallas
flash-attention kernel is the TPU answer, with an XLA fallback that is still
fused reasonably well for small S.

Softmax always runs in fp32 (the reference's ``upcast_softmax=True`` diffusers
setting) even when the surrounding network is bf16.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

from . import backend


def _xla_attention(q, k, v):
    """Reference implementation: (B, S, D) single-head attention."""
    d = q.shape[-1]
    scale = 1.0 / (d ** 0.5)
    scores = jnp.einsum("bqd,bkd->bqk", q, k).astype(jnp.float32) * scale
    weights = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    return jnp.einsum("bqk,bkd->bqd", weights.astype(v.dtype), v)


# Measured crossover on the v5e (benchmarks/attention_bench.py, D=512,
# bf16): XLA is ~16% faster at S=4096 (the 512px mid-block), the flash
# kernel wins from S=9216 up (1.03-1.04x at 9216/16384, 76 TFLOP/s) and
# keeps O(S) memory where XLA materializes B*S^2 fp32 scores.  4608 is the
# first bucketed mid-block length above 4096 (576px).  The tagger-head MHSA
# (S=64) always takes the XLA path.
_FLASH_MIN_SEQ = 4608

# When a gradient flows through the attention the economics shift: XLA's
# backward rematerializes the B*S^2 fp32 score matrix (1.6 GB/pass at the
# 512px bs8 triplet step) while the Pallas backward stays O(S).  Measured in
# the full train_full step (benchmarks/probe_512_full.py, S=4096 bs8
# triplets): flash 868.4 ms/step vs XLA 881.7, peak HBM 11.21 vs 12.06 GB —
# so training-context dispatch engages one bucket earlier.  S below 4096 is
# unmeasured in a training context and keeps the forward policy.
_FLASH_MIN_SEQ_TRAIN = 4096

# Trace-time flag: dispatch runs in Python while a step function is being
# traced, so the train-step builders (train/steps.py) wrap their bodies in
# training_trace() and inference/eval tracing stays on the forward policy.
_IN_TRAINING_TRACE = False


@contextlib.contextmanager
def training_trace():
    """Mark the enclosed (trace-time) region as gradient-carrying.

    Attention sites traced inside this context use the training crossover
    _FLASH_MIN_SEQ_TRAIN instead of the forward-only _FLASH_MIN_SEQ."""
    global _IN_TRAINING_TRACE
    prev = _IN_TRAINING_TRACE
    _IN_TRAINING_TRACE = True
    try:
        yield
    finally:
        _IN_TRAINING_TRACE = prev


def _min_flash_seq() -> int:
    return _FLASH_MIN_SEQ_TRAIN if _IN_TRAINING_TRACE else _FLASH_MIN_SEQ


# Spatial (height-sharded) parallelism context: GSPMD cannot partition a
# hand-written Pallas kernel, so spatial traces force the XLA op path —
# which at model-axis 2 leaves 8192 local mid-block tokens on the O(S^2)
# XLA attention, exactly where the kernel wins (VERDICT r3 next #4).  The
# escape hatch is manual SPMD: shard_map all-gathers K/V across the spatial
# axis and runs the flash kernel on the LOCAL q rows (rectangular
# attention).  The context records the mesh/axes AND whether the kernel was
# dispatchable at entry time — it is entered BEFORE the backend("xla")
# override, which would otherwise mask kernel availability.
_SPATIAL_CTX = None  # (mesh, spatial_axis, batch_axis, flash_capable)

# test hook: force the shard_map route even when the kernel would not
# engage (CPU meshes), so the collective structure is exercised in CI
_FORCE_SPATIAL_SHARD_MAP = False


@contextlib.contextmanager
def spatial_attention_trace(mesh, spatial_axis: str = "model",
                            batch_axis=None):
    """Mark the enclosed trace as spatially partitioned over ``mesh``.

    Attention sites traced inside route to the shard_map + flash-kernel
    form when the LOCAL sequence clears the measured crossover; everything
    else keeps the (forced-XLA) GSPMD path.  Enter this BEFORE
    backend.backend('xla')."""
    global _SPATIAL_CTX
    prev = _SPATIAL_CTX
    _SPATIAL_CTX = (mesh, spatial_axis, batch_axis,
                    backend.use_pallas("flash_attention"))
    try:
        yield
    finally:
        _SPATIAL_CTX = prev


def _spatial_sharded_attention(q, k, v):
    """shard_map form: local q rows x all-gathered global K/V.

    q/k/v are the logical (B, S, D) arrays of a GSPMD-partitioned trace
    with S sharded over the spatial axis.  The in_specs force that layout;
    all_gather rides ICI; the flash kernel runs per shard on (B, S/n, D)
    queries against (B, S, D) keys/values (rectangular kernel support in
    ops/pallas/flash_attention.py).  Falls back to the plain GSPMD XLA
    path when the kernel would not engage."""
    mesh, spatial_axis, batch_axis, flash_capable = _SPATIAL_CTX
    n = int(mesh.shape[spatial_axis])
    s = q.shape[1]
    use_flash = (flash_capable and n > 1 and s % n == 0
                 and s // n >= _min_flash_seq())
    if not (use_flash or (_FORCE_SPATIAL_SHARD_MAP and n > 1
                          and s % n == 0)):
        return _xla_attention(q, k, v)

    from jax.sharding import PartitionSpec as P

    spec = P(batch_axis, spatial_axis, None)

    def local_attn(ql, kl, vl):
        kg = jax.lax.all_gather(kl, spatial_axis, axis=1, tiled=True)
        vg = jax.lax.all_gather(vl, spatial_axis, axis=1, tiled=True)
        if use_flash:
            from .pallas.flash_attention import flash_attention

            return flash_attention(ql, kg, vg)
        return _xla_attention(ql, kg, vg)

    return _shard_map(local_attn, mesh, (spec, spec, spec), spec)(q, k, v)


def _shard_map(f, mesh, in_specs, out_specs):
    """jax.shard_map across the API renames (shard_map moved out of
    jax.experimental and check_rep became check_vma)."""
    import jax as _jax

    if hasattr(_jax, "shard_map"):
        try:
            return _jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                                  out_specs=out_specs, check_vma=False)
        except TypeError:
            return _jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                                  out_specs=out_specs)
    from jax.experimental.shard_map import shard_map as _sm

    return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
               check_rep=False)


def spatial_single_head_attention(q, k, v):
    """Single-head self-attention over spatial tokens, (B, S, D) -> (B, S, D).

    Dispatches to the Pallas flash-attention kernel on TPU when the sequence
    is long enough to benefit (measured, see _FLASH_MIN_SEQ /
    _FLASH_MIN_SEQ_TRAIN); otherwise uses the XLA path.  Inside a
    spatial_attention_trace() the shard_map + flash form takes over when
    the LOCAL (per-shard) sequence clears the crossover.
    """
    if _SPATIAL_CTX is not None:
        return _spatial_sharded_attention(q, k, v)
    s = q.shape[1]
    if backend.use_pallas("flash_attention") and s >= _min_flash_seq():
        from .pallas.flash_attention import flash_attention

        return flash_attention(q, k, v)
    return _xla_attention(q, k, v)
