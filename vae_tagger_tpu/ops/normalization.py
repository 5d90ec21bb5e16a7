"""Normalization primitives (NHWC, functional).

GroupNorm statistics are computed in fp32 regardless of compute dtype — the
VAE stacks 30+ GroupNorms and bf16 variance accumulation visibly degrades
latent parity.  The affine transform is applied in the input dtype so the
surrounding network stays in bf16.

Torch semantics being matched: ``nn.GroupNorm(num_groups, C, eps)`` groups
*consecutive* channels; used with eps=1e-6 throughout the diffusers VAE the
reference instantiates (``/root/reference/diffusers_vae_loader.py:8-35``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def group_norm(x, scale, bias, *, num_groups: int, eps: float = 1e-6):
    """GroupNorm over an NHWC tensor.

    x:     (..., H, W, C)
    scale: (C,)  bias: (C,)
    """
    orig_dtype = x.dtype
    n, h, w, c = x.shape
    if c % num_groups:
        raise ValueError(f"channels {c} not divisible by groups {num_groups}")
    xg = x.astype(jnp.float32).reshape(n, h, w, num_groups, c // num_groups)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(n, h, w, c).astype(orig_dtype)
    return x * scale.astype(orig_dtype) + bias.astype(orig_dtype)


@functools.lru_cache(maxsize=None)
def _make_group_norm_silu(num_groups: int, eps: float, apply_silu: bool):
    """Build the (cached) dispatching GroupNorm[+SiLU] with a custom VJP.

    Forward uses the fused Pallas kernel on TPU when one sample fits VMEM
    (one HBM pass instead of XLA's two); backward always differentiates
    through the XLA reference (recompute — GN backward is cheap next to the
    adjacent convs and keeps the kernel forward-only).
    """

    def reference(x, scale, bias):
        y = group_norm(x, scale, bias, num_groups=num_groups, eps=eps)
        if apply_silu:
            y = y * jax.nn.sigmoid(y.astype(jnp.float32)).astype(y.dtype)
        return y

    def dispatch(x, scale, bias):
        from . import backend

        n, h, w, c = x.shape
        if backend.use_pallas("groupnorm_silu"):
            from .pallas.groupnorm_silu import (
                _chunk_tile,
                fits_in_vmem,
                group_norm_silu_chunked_pallas,
                group_norm_silu_pallas,
            )

            if fits_in_vmem(h * w, c, x.dtype.itemsize):
                return group_norm_silu_pallas(
                    x, scale, bias, num_groups=num_groups, eps=eps,
                    apply_silu=apply_silu)
            # sample exceeds VMEM (1024px mid/out GN sites): grid-chunked
            # two-phase kernel — measured SLOWER than XLA's two passes in
            # context (benchmarks/ablate.py no_fused_conv: 21.9 vs 30.2
            # img/s), so auto policy leaves it off; backend "pallas" forces
            # it (lane-aligned channels only)
            tile = (_chunk_tile(h * w, c, x.dtype.itemsize)
                    if c % 128 == 0
                    and backend.use_pallas("groupnorm_silu_chunked") else 0)
            if tile:
                return group_norm_silu_chunked_pallas(
                    x, scale, bias, num_groups=num_groups, tile=tile,
                    eps=eps, apply_silu=apply_silu)
        return reference(x, scale, bias)

    @jax.custom_vjp
    def fn(x, scale, bias):
        return dispatch(x, scale, bias)

    def fwd(x, scale, bias):
        return dispatch(x, scale, bias), (x, scale, bias)

    def bwd(residuals, g):
        return jax.vjp(reference, *residuals)[1](g)

    fn.defvjp(fwd, bwd)
    return fn


def group_norm_silu(x, scale, bias, *, num_groups: int, eps: float = 1e-6,
                    apply_silu: bool = True):
    """GroupNorm optionally fused with SiLU; Pallas-accelerated on TPU."""
    return _make_group_norm_silu(num_groups, float(eps), bool(apply_silu))(
        x, scale, bias)


def layer_norm(x, scale, bias, *, eps: float = 1e-5):
    """LayerNorm over the last axis (torch ``nn.LayerNorm`` semantics,
    used by the tagger heads at ``/root/reference/modules.py:64,320-330``)."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * (var + eps) ** -0.5
    y = y.astype(orig_dtype)
    return y * scale.astype(orig_dtype) + bias.astype(orig_dtype)
