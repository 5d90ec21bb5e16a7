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

import contextlib
import functools

import jax
import jax.numpy as jnp

from .normalization import group_norm

# --------------------------------------------------------------------------
# H-folded "slab" convolution — sublane recovery for tiny batches
# --------------------------------------------------------------------------
# The v5e conv emitter wants the batch dimension in full 8-row sublane
# groups: per-pixel conv throughput at N % 8 != 0 runs below the N=8 rate
# (docs/PERF.md, adaptive-stacking section).  Padding the batch to 8 costs
# 8/N x memory — impossible at 1024px bs1 (a single step already peaks
# 14.1 GB).  Slab mode instead folds the image HEIGHT into the batch:
# (B, H, W, C) -> (B*S, H/S, W, C), which is memory-NEUTRAL.  Activations
# stay in image layout between ops — the slab reshape happens inside the
# conv only, and merging/splitting leading dims is layout-free on TPU
# (tiling applies to the minor (W, C) dims) — so GroupNorm stats,
# attention, and residual adds are untouched.
#
# MEASURED VERDICT (docs/PERF.md "slab convolution" section): REJECTED for
# automatic dispatch.  At the full-encode level slab mode is a wash at N=1
# (42.2 -> 43.7 ms @1024px) and loses to sequential per-member encodes at
# N=3 (3x42.2=126.6 vs 143.1 stacked-slab), because (a) the N=1 penalty at
# 1024px is only 1.31x (not the 3x seen at 768x576), and (b) the folded
# conv at H/8 rows per sample runs ~1.4x below the true N=8 H-full rate —
# folding trades the batch dimension for per-sample spatial extent the
# conv emitter also wants.  The op stays parity-tested and available via
# an explicit ``slab_trace(n)`` context (same trace-time-context pattern
# as ops/attention.py::training_trace); nothing enables it by default.

_SLAB_TRACE = 0
_SLAB_METHOD = "halo"


@contextlib.contextmanager
def slab_trace(n_slabs: int, method: str = "halo"):
    """Trace-time context: eligible convs under this trace run H-folded
    into ``n_slabs`` slabs per image (full sublane rows at tiny batch)."""
    global _SLAB_TRACE, _SLAB_METHOD
    prev, prev_m = _SLAB_TRACE, _SLAB_METHOD
    _SLAB_TRACE, _SLAB_METHOD = int(n_slabs), method
    try:
        yield
    finally:
        _SLAB_TRACE, _SLAB_METHOD = prev, prev_m


def current_slabs() -> int:
    return _SLAB_TRACE


def slab_eligible(x_shape, kernel_shape, strides, padding) -> bool:
    """Is this conv one the slab path implements, at a shape where folding
    pays?  (3x3 stride-1 SAME and the diffusers stride-2 ((0,1),(0,1))
    downsample; H divisible into >=8-row slabs; batch not already a
    sublane multiple.)"""
    s = _SLAB_TRACE
    if s <= 1:
        return False
    n, h, w, _ = x_shape
    kh, kw = kernel_shape[0], kernel_shape[1]
    if (kh, kw) != (3, 3):
        return False  # 1x1 convs are batch-agnostic matmuls already
    if n % 8 == 0:
        return False  # already full sublane rows; folding only adds halos
    if h % s or (h // s) < 8:
        return False
    if strides == (1, 1):
        return padding == "SAME"
    if strides == (2, 2):
        return padding == ((0, 1), (0, 1)) and (h // s) % 2 == 0
    return False


def conv2d_slabbed(x, kernel, bias, *, strides=(1, 1), n_slabs=None,
                   method=None):
    """3x3 conv computed in H-folded slab layout; same result as the
    image-layout conv (SAME for stride 1; diffusers ((0,1),(0,1)) for
    stride 2).

    x: (B, H, W, Cin) -> (B, H/sh, W/sw, Cout).  XLA sees a batch of
    B*n_slabs full-sublane rows.  Two formulations, both measured
    (docs/PERF.md):

    - ``method="halo"`` (default — measured faster): each slab carries
      explicit halo rows gathered from its neighbors before one conv.
      The halo concat materializes one activation copy per conv, but XLA
      keeps the conv itself on its fast path (19.9 ms at the 1024²×128
      block pair vs 21.4 plain N=1).
    - ``method="fixup"``: conv the folded tensor directly with per-slab
      zero padding (no input copy), then overwrite the boundary-straddling
      rows with a tiny strip conv.  Math-identical, but the row scatter
      is NOT free on this backend and the method measured slower (23.1 ms
      at the same block pair).
    """
    s = n_slabs or _SLAB_TRACE
    method = method or _SLAB_METHOD
    b, hh, w, cin = x.shape
    h = hh // s
    x5 = x.reshape(b, s, h, w, cin)
    dn = ("NHWC", "HWIO", "NHWC")
    if method == "fixup":
        xs = x.reshape(b * s, h, w, cin)
        if strides == (1, 1):
            # Per-slab SAME: every row is correct except the two rows per
            # internal boundary whose 3x3 window saw a zero pad where a
            # neighbor-slab row belongs (the outermost image rows' zero
            # pads are the true image padding).
            out = jax.lax.conv_general_dilated(
                xs, kernel, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)
            # strip = image rows (i+1)h-2 .. (i+1)h+1 for each internal
            # boundary i: VALID 3-tap conv over 4 rows -> the 2 correct
            # boundary-straddling output rows.
            strip = jnp.concatenate([x5[:, :-1, h - 2:], x5[:, 1:, :2]],
                                    axis=2)
            strip = strip.reshape(b * (s - 1), 4, w, cin)
            fix = jax.lax.conv_general_dilated(
                strip, kernel, (1, 1), ((0, 0), (1, 1)),
                dimension_numbers=dn)
            fix = fix.reshape(b, s - 1, 2, w, -1)
            out5 = out.reshape(b, s, h, w, -1)
            out5 = out5.at[:, :-1, h - 1].set(fix[:, :, 0])
            out5 = out5.at[:, 1:, 0].set(fix[:, :, 1])
            out = out5
            h_out, w_out = h, w
        else:
            # Stride-2, diffusers (0,1),(0,1) pad: output row j reads input
            # rows 2j..2j+2, so only each non-final slab's LAST output row
            # saw a wrong zero pad (needs the next slab's first row).
            out = jax.lax.conv_general_dilated(
                xs, kernel, (2, 2), ((0, 1), (0, 1)), dimension_numbers=dn)
            strip = jnp.concatenate([x5[:, :-1, h - 2:], x5[:, 1:, :1]],
                                    axis=2)
            strip = strip.reshape(b * (s - 1), 3, w, cin)
            fix = jax.lax.conv_general_dilated(
                strip, kernel, (2, 2), ((0, 0), (0, 1)),
                dimension_numbers=dn)
            h_out, w_out = h // 2, (w + 1) // 2
            fix = fix.reshape(b, s - 1, 1, w_out, -1)
            out5 = out.reshape(b, s, h_out, w_out, -1)
            out5 = out5.at[:, :-1, h_out - 1].set(fix[:, :, 0])
            out = out5
        if bias is not None:
            out = out + bias.astype(out.dtype)
        return out.reshape(b, s * h_out, w_out, out.shape[-1])

    zero = jnp.zeros((b, 1, 1, w, cin), x.dtype)
    if strides == (1, 1):
        # one halo row each side: slab s's row -1 is slab s-1's last row
        top = jnp.concatenate([zero, x5[:, :-1, -1:]], axis=1)
        bot = jnp.concatenate([x5[:, 1:, :1], zero], axis=1)
        xh = jnp.concatenate([top, x5, bot], axis=2)
        xh = xh.reshape(b * s, h + 2, w, cin)
        out = jax.lax.conv_general_dilated(
            xh, kernel, (1, 1), ((0, 0), (1, 1)), dimension_numbers=dn)
        h_out, w_out = h, w
    else:
        # stride-2 output row j reads input rows 2j..2j+2: one bottom halo
        # row; the last slab's zero row IS the image-level (0,1) bottom pad
        bot = jnp.concatenate([x5[:, 1:, :1], zero], axis=1)
        xh = jnp.concatenate([x5, bot], axis=2)
        xh = xh.reshape(b * s, h + 1, w, cin)
        out = jax.lax.conv_general_dilated(
            xh, kernel, (2, 2), ((0, 0), (0, 1)), dimension_numbers=dn)
        h_out, w_out = h // 2, (w + 1) // 2
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.reshape(b, s * h_out, w_out, out.shape[-1])


# --------------------------------------------------------------------------
# NCHW-island experiment hook (round 4, VERDICT r3 weak #1 / next #8)
# --------------------------------------------------------------------------
# The 1024px bs1 backward trace shows ~97 ms/step of XLA-internal layout
# copies on STAGE-0 activations (bf16[1024,8,130,128] {3,1,2,0}->{3,0,2,1}
# between fusion outputs and conv inputs; docs/PERF.md).  Layout assignment
# has no JAX-level handle, but dimension_numbers do: this context reroutes
# small-channel 3x3 convs through an explicit NCHW island (transpose ->
# NCHW conv -> transpose back), letting XLA pick different layouts for the
# stage-0 region.  OFF by default — it exists for the measured A/B in
# benchmarks/bs1_layout_probe.py; see docs/PERF.md for the verdict.

_NCHW_MAX_C = 0


@contextlib.contextmanager
def nchw_island_trace(max_channels: int = 128):
    """Trace-time context: 3x3 convs with c_in <= max_channels run as an
    explicit NCHW island (layout experiment; math-identical)."""
    global _NCHW_MAX_C
    prev = _NCHW_MAX_C
    _NCHW_MAX_C = int(max_channels)
    try:
        yield
    finally:
        _NCHW_MAX_C = prev


def conv_nhwc(x, kernel, strides=(1, 1), padding="SAME", **kw):
    """One owner of the NHWC lax conv call; under nchw_island_trace,
    eligible 3x3 convs run via an NCHW island instead."""
    if (_NCHW_MAX_C and kernel.shape[0] == 3 and kernel.shape[1] == 3
            and x.shape[-1] <= _NCHW_MAX_C):
        xt = jnp.transpose(x, (0, 3, 1, 2))
        out = jax.lax.conv_general_dilated(
            xt, kernel, strides, padding,
            dimension_numbers=("NCHW", "HWIO", "NCHW"), **kw)
        return jnp.transpose(out, (0, 2, 3, 1))
    return jax.lax.conv_general_dilated(
        x, kernel, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), **kw)


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
        out = conv_nhwc(y, kernel.astype(y.dtype), (1, 1), "SAME",
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
