"""Fused GroupNorm->SiLU->Conv3x3(+residual) op with dispatch and VJP.

This is the TPU-native replacement for the cuDNN conv stacks inside the
reference's diffusers VAE (``/root/reference/diffusers_vae_loader.py:8-35``):
every ResnetBlock branch ``conv(silu(gn(x)))`` [+ residual / 1x1 shortcut]
goes through here.  With the "pallas" backend forced and admissible shapes
it runs the Pallas fused kernel (ops/pallas/conv_fused.py) after a single
XLA fp32 stats pass over x; the DEFAULT auto policy routes to the XLA
reference (GroupNorm -> SiLU -> lax.conv), which measured faster in context
at every stage shape (docs/PERF.md).

Backward: custom VJP differentiating through the XLA reference (recompute).
GN+SiLU backward is cheap next to the conv's own backward convs, and this
keeps the Pallas kernel forward-only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .normalization import group_norm


def group_stats(x, num_groups: int):
    """Per-(sample, group) fp32 mean and E[x^2] in one pass over x."""
    n, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(n, h * w, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3))
    meansq = jnp.mean(xf * xf, axis=(1, 3))
    return mean, meansq


def effective_affine(mean, meansq, gn_scale, gn_bias, c: int, eps: float):
    """Fold GN stats and affine params into per-(sample, channel) scale/bias.

    Matches the factorization used by the whole-sample GN kernel
    (ops/pallas/groupnorm_silu.py): rstd = rsqrt(E[x^2] - mean^2 + eps).
    """
    num_groups = mean.shape[-1]
    reps = c // num_groups
    rstd = jax.lax.rsqrt(meansq - mean * mean + eps)
    eff_scale = gn_scale.astype(jnp.float32)[None, :] * jnp.repeat(
        rstd, reps, axis=1)
    eff_bias = gn_bias.astype(jnp.float32)[None, :] - jnp.repeat(
        mean, reps, axis=1) * eff_scale
    return eff_scale, eff_bias


@functools.lru_cache(maxsize=None)
def _make_fused(num_groups: int, eps: float, has_res: bool, has_sc: bool):
    """Build the dispatching fused op for one (groups, eps, variant)."""

    def reference(x, gn_scale, gn_bias, kernel, bias, *rest):
        y = group_norm(x, gn_scale, gn_bias, num_groups=num_groups, eps=eps)
        y = y * jax.nn.sigmoid(y.astype(jnp.float32)).astype(y.dtype)
        out = jax.lax.conv_general_dilated(
            y, kernel.astype(y.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        out = out + bias.astype(jnp.float32)
        if has_sc:
            residual, sck, scb = rest
            r = jax.lax.conv_general_dilated(
                residual.astype(y.dtype),
                sck.astype(y.dtype).reshape(1, 1, residual.shape[-1], -1),
                (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            out = out + r + scb.astype(jnp.float32)
        elif has_res:
            out = out + rest[0].astype(jnp.float32)
        return out.astype(x.dtype)

    def dispatch(x, gn_scale, gn_bias, kernel, bias, *rest):
        from . import backend

        n, h, w, c_in = x.shape
        c_out = kernel.shape[-1]
        if backend.use_pallas("conv_fused"):
            from .pallas.conv_fused import (
                gn_silu_conv3x3_pallas,
                plan_fused_conv,
            )

            c_res = rest[0].shape[-1] if (has_res or has_sc) else None
            plan = plan_fused_conv(h, w, c_in, c_out, c_res,
                                   x.dtype.itemsize)
            if plan is not None:
                mean, meansq = group_stats(x, num_groups)
                eff_scale, eff_bias = effective_affine(
                    mean, meansq, gn_scale, gn_bias, c_in, eps)
                if has_sc:
                    residual, sck, scb = rest
                    return gn_silu_conv3x3_pallas(
                        x, eff_scale, eff_bias, kernel, bias, residual,
                        sck, scb, tile_h=plan[0], tile_cout=plan[1])
                if has_res:
                    return gn_silu_conv3x3_pallas(
                        x, eff_scale, eff_bias, kernel, bias, rest[0],
                        tile_h=plan[0], tile_cout=plan[1])
                return gn_silu_conv3x3_pallas(
                    x, eff_scale, eff_bias, kernel, bias,
                    tile_h=plan[0], tile_cout=plan[1])
        return reference(x, gn_scale, gn_bias, kernel, bias, *rest)

    @jax.custom_vjp
    def fn(*args):
        return dispatch(*args)

    def fwd(*args):
        return dispatch(*args), args

    def bwd(residuals, g):
        return jax.vjp(reference, *residuals)[1](g)

    fn.defvjp(fwd, bwd)
    fn.reference = reference
    return fn


def gn_silu_conv3x3(x, gn_scale, gn_bias, kernel, bias, residual=None,
                    shortcut_kernel=None, shortcut_bias=None, *,
                    num_groups: int, eps: float = 1e-6):
    """Fused ResnetBlock branch: conv3x3(silu(gn(x))) + bias [+ residual].

    With ``shortcut_kernel``/``shortcut_bias`` the residual is first
    projected by the 1x1 conv_shortcut (diffusers ResnetBlock2D semantics).
    Pallas-accelerated on TPU; XLA reference elsewhere and for backward.
    """
    has_sc = shortcut_kernel is not None
    has_res = residual is not None
    fn = _make_fused(num_groups, float(eps), has_res and not has_sc, has_sc)
    if has_sc:
        return fn(x, gn_scale, gn_bias, kernel, bias, residual,
                  shortcut_kernel, shortcut_bias)
    if has_res:
        return fn(x, gn_scale, gn_bias, kernel, bias, residual)
    return fn(x, gn_scale, gn_bias, kernel, bias)
