"""Fused GroupNorm + SiLU Pallas kernel.

The FLUX VAE stacks ~30 GroupNorm->SiLU pairs in front of convs (every
ResnetBlock, the attention pre-norm, and the output heads).  XLA computes GN
as two passes over HBM (stats, then normalize) and fuses the SiLU into the
second.  Most GN sites now go through the fused GN+SiLU+conv kernel
(ops/pallas/conv_fused.py); the standalone kernels here serve the remaining
sites (attention pre-norm, output heads) and any non-conv use.  When one
sample's activation block fits in VMEM — true for every stage at <=256px —
the whole-sample kernel below does the op in ONE HBM read + write: load
(S, C) into VMEM, reduce stats on-chip, normalize + affine + SiLU in
registers, write out.  Larger samples (512-1024px sites) take the
grid-chunked two-phase kernel at the bottom of this file.

Grid: one program per batch element.  Stats accumulate in fp32 regardless of
input dtype.  Backward falls back to autodiff through the XLA reference
implementation (recompute; GN backward is cheap relative to the convs).

Dispatch + fallback logic lives in ops/normalization.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Scoped VMEM is 16MB and pallas double-buffers grid blocks: budget is
# 2x(in block) + 2x(out block) + tile temps.  Keep ~2MB slack for temps.
_VMEM_SCOPED_BYTES = 16 * 1024 * 1024
_TEMP_SLACK_BYTES = 2 * 1024 * 1024


def fits_in_vmem(s: int, c: int, itemsize: int) -> bool:
    return 4 * s * c * itemsize + _TEMP_SLACK_BYTES <= _VMEM_SCOPED_BYTES


def _choose_tile(s: int) -> int:
    for tile in (512, 256, 128, 64, 32, 16, 8):
        if s % tile == 0:
            return tile
    return s


def _group_affine(ch_sum, ch_sq, scale, bias, *, num_groups: int,
                  count: float, eps: float):
    """(1,C) channel sums/sqsums -> (1,C) effective scale/bias.

    Group reductions as matmuls against a 0/1 membership matrix: Mosaic
    rejects lane-dimension reshapes ((1,C)->(G,C/G)), and a (C,G) matmul
    is trivial MXU work.  The dots are pinned to HIGHEST precision: at the
    MXU default, the (1,C) channel-sum operand is rounded to bf16 passes,
    which put ~bf16-relative noise on the group stats — measured 1e-3 to
    3.8e-3 output rel err at the production GN shapes on the v5e
    (benchmarks/kernel_numerics.py), and made the "stats are fp32" claim
    of this module false on hardware.  The matmuls are (1,C)@(C,G) —
    a few extra passes on a vector are free next to the data movement."""
    c = ch_sum.shape[-1]
    cg = c // num_groups
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    g_idx = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    member = (c_idx // cg == g_idx).astype(jnp.float32)   # (C, G)

    hi = jax.lax.Precision.HIGHEST
    g_sum = jnp.dot(ch_sum, member, preferred_element_type=jnp.float32,
                    precision=hi)
    g_sq = jnp.dot(ch_sq, member, preferred_element_type=jnp.float32,
                   precision=hi)
    n = jnp.float32(count)
    g_mean = g_sum / n
    g_rstd = jax.lax.rsqrt(g_sq / n - g_mean * g_mean + eps)

    # scatter group stats back to channels: (1, G) @ (G, C)
    mean_c = jnp.dot(g_mean, member.T, preferred_element_type=jnp.float32,
                     precision=hi)
    rstd_c = jnp.dot(g_rstd, member.T, preferred_element_type=jnp.float32,
                     precision=hi)
    eff_scale = scale.astype(jnp.float32) * rstd_c
    eff_bias = bias.astype(jnp.float32) - mean_c * eff_scale
    return eff_scale, eff_bias


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, *,
                    num_groups: int, eps: float, apply_silu: bool,
                    tile: int):
    s, c = x_ref.shape[1], x_ref.shape[2]
    n_tiles = s // tile

    # pass 1: per-channel fp32 sums, tile by tile (a full-block fp32 temp
    # would blow the 16MB scoped-VMEM limit at the 512-channel stages)
    def stats_body(i, acc):
        sum_acc, sq_acc = acc
        xt = x_ref[0, pl.ds(i * tile, tile), :].astype(jnp.float32)
        return (sum_acc + jnp.sum(xt, axis=0, keepdims=True),
                sq_acc + jnp.sum(xt * xt, axis=0, keepdims=True))

    ch_sum, ch_sq = jax.lax.fori_loop(
        0, n_tiles, stats_body,
        (jnp.zeros((1, c), jnp.float32), jnp.zeros((1, c), jnp.float32)))

    eff_scale, eff_bias = _group_affine(
        ch_sum, ch_sq, scale_ref[:], bias_ref[:], num_groups=num_groups,
        count=s * (c // num_groups), eps=eps)

    # pass 2 (VMEM-resident, no extra HBM traffic): affine + SiLU per tile
    def apply_body(i, _):
        xt = x_ref[0, pl.ds(i * tile, tile), :].astype(jnp.float32)
        y = xt * eff_scale + eff_bias
        if apply_silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0, pl.ds(i * tile, tile), :] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_tiles, apply_body, 0)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps",
                                             "apply_silu"))
def group_norm_silu_pallas(x, scale, bias, *, num_groups: int,
                           eps: float = 1e-6, apply_silu: bool = True):
    """x: (N, H, W, C) -> GroupNorm(+SiLU), one HBM pass per sample."""
    n, h, w, c = x.shape
    s = h * w
    x2 = x.reshape(n, s, c)
    out = pl.pallas_call(
        functools.partial(_gn_silu_kernel, num_groups=num_groups, eps=eps,
                          apply_silu=apply_silu, tile=_choose_tile(s)),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, s, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=10 * n * s * c,
            bytes_accessed=2 * n * s * c * x.dtype.itemsize,
            transcendentals=n * s * c if apply_silu else 0,
        ),
    )(x2, scale.reshape(1, c), bias.reshape(1, c))
    return out.reshape(n, h, w, c)


# ---------------------------------------------------------------------------
# Grid-chunked two-phase variant: covers samples too large for VMEM
# (e.g. the 1024px mid/out GN sites whose resnet siblings go through the
# fused conv kernel).  TPU grids execute sequentially and scratch persists
# across steps, so phase 0 accumulates per-channel sums tile-by-tile into
# scratch and phase 1 re-reads the tiles to normalize — the same 2-read/
# 1-write HBM traffic as XLA's two passes, but on our dispatch path
# (backend-controllable, SiLU always fused, stats exactly fp32).
# ---------------------------------------------------------------------------

def _gn_silu_chunked_kernel(x_ref, scale_ref, bias_ref, o_ref, acc_ref, *,
                            num_groups: int, eps: float, apply_silu: bool,
                            s: int, c: int):
    phase = pl.program_id(1)
    i = pl.program_id(2)
    n_tiles = pl.num_programs(2)
    tile = x_ref.shape[1]

    @pl.when((phase == 0) & (i == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(phase == 0)
    def _():
        xt = x_ref[0].astype(jnp.float32)
        acc_ref[0:1] += jnp.sum(xt, axis=0, keepdims=True)
        acc_ref[1:2] += jnp.sum(xt * xt, axis=0, keepdims=True)
        # the out block mapped to this step is a dummy (overwritten in
        # phase 1); zero it so the buffer never leaks uninitialized VMEM
        @pl.when(i == n_tiles - 1)
        def _():
            o_ref[0] = jnp.zeros_like(o_ref[0])

    @pl.when(phase == 1)
    def _():
        @pl.when(i == 0)
        def _():
            eff_scale, eff_bias = _group_affine(
                acc_ref[0:1], acc_ref[1:2], scale_ref[:], bias_ref[:],
                num_groups=num_groups, count=s * (c // num_groups), eps=eps)
            acc_ref[2:3] = eff_scale
            acc_ref[3:4] = eff_bias

        y = x_ref[0].astype(jnp.float32) * acc_ref[2:3] + acc_ref[3:4]
        if apply_silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0] = y.astype(o_ref.dtype)


def _chunk_tile(s: int, c: int, itemsize: int) -> int:
    """Largest tile (rows of C) dividing s that keeps blocks comfortably
    under VMEM with double buffering (2 in + 2 out + fp32 temp)."""
    budget = 8 * 1024 * 1024
    for tile in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if s % tile:
            continue
        if tile * c * (4 * itemsize + 4) <= budget:
            return tile
    return 0


@functools.partial(jax.jit, static_argnames=("num_groups", "eps",
                                             "apply_silu", "tile"))
def group_norm_silu_chunked_pallas(x, scale, bias, *, num_groups: int,
                                   tile: int, eps: float = 1e-6,
                                   apply_silu: bool = True):
    """x: (N, H, W, C) -> GroupNorm(+SiLU) for samples that exceed VMEM."""
    n, h, w, c = x.shape
    s = h * w
    x2 = x.reshape(n, s, c)
    n_tiles = s // tile
    out = pl.pallas_call(
        functools.partial(_gn_silu_chunked_kernel, num_groups=num_groups,
                          eps=eps, apply_silu=apply_silu, s=s, c=c),
        grid=(n, 2, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda b, ph, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, ph, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, ph, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # phase 0 parks every step on out block (b, 0) (one dummy writeback);
        # phase 1 writes the real rows
        out_specs=pl.BlockSpec(
            (1, tile, c),
            lambda b, ph, i: (b, jnp.where(ph == 0, 0, i), 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, s, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((4, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=10 * n * s * c,
            bytes_accessed=3 * n * s * c * x.dtype.itemsize,
            transcendentals=n * s * c if apply_silu else 0,
        ),
    )(x2, scale.reshape(1, c), bias.reshape(1, c))
    return out.reshape(n, h, w, c)
