"""Fused GroupNorm + SiLU Pallas kernel.

The FLUX VAE stacks ~30 GroupNorm->SiLU pairs in front of convs (every
ResnetBlock, the attention pre-norm, and the output heads).  XLA computes GN
as two passes over HBM (stats, then normalize) and fuses the SiLU into the
second.  When one sample's activation block fits in VMEM — true for every
stage at <=512px and all 256-and-up-channel stages at 1024px — this kernel
does the whole thing in ONE HBM read + write: load (S, C) into VMEM, reduce
stats on-chip, normalize + affine + SiLU in registers, write out.

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


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, *,
                    num_groups: int, eps: float, apply_silu: bool,
                    tile: int):
    s, c = x_ref.shape[1], x_ref.shape[2]
    cg = c // num_groups
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

    # Group reductions as matmuls against a 0/1 membership matrix: Mosaic
    # rejects lane-dimension reshapes ((1,C)->(G,C/G)), and a (C,G) matmul
    # is trivial MXU work.
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    g_idx = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    member = (c_idx // cg == g_idx).astype(jnp.float32)   # (C, G)

    g_sum = jnp.dot(ch_sum, member, preferred_element_type=jnp.float32)
    g_sq = jnp.dot(ch_sq, member, preferred_element_type=jnp.float32)
    n = jnp.float32(s * cg)
    g_mean = g_sum / n
    g_rstd = jax.lax.rsqrt(g_sq / n - g_mean * g_mean + eps)

    # scatter group stats back to channels: (1, G) @ (G, C)
    mean_c = jnp.dot(g_mean, member.T, preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(g_rstd, member.T, preferred_element_type=jnp.float32)
    eff_scale = scale_ref[:].astype(jnp.float32) * rstd_c
    eff_bias = bias_ref[:].astype(jnp.float32) - mean_c * eff_scale

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
