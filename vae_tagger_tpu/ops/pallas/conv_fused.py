"""Fused GroupNorm+SiLU+Conv3x3(+residual) Pallas TPU kernel — the
BASELINE.json north star.

Every ResnetBlock in the FLUX VAE (the conv stack the reference builds via
diffusers at ``/root/reference/diffusers_vae_loader.py:8-35``) computes
``conv3x3(silu(groupnorm(x)))`` and then adds a residual.  XLA materializes
the normalized+activated tensor to HBM between the GroupNorm fusion and the
convolution (convolutions do not absorb producer fusions on TPU), so each
GN+conv pair moves 5 full activation passes through HBM: stats read,
normalize read+write, conv read+write.  This kernel normalizes *inside* the
conv's input tile load, cutting the pair to 3 passes (stats read outside,
fused read, conv write) and folding the residual add (and the 1x1
conv_shortcut projection) into the conv epilogue — which removes the
separate residual read+write as well.

Decomposition (v2 — two other variants measured slower in context on the
chip, see benchmarks/ablate.py and benchmarks/stage0_probe.py: v1 built 9
W-shifted input patches per output tile and was VPU/relayout-bound; a v3
im2col variant staged a ``(TH*W, 9*Cin)`` patch for one full-depth matmul,
but the patch-building copies cost more than the MXU-depth gain):

- The activated tile lives in a bf16 VMEM *scratch* of shape
  ``(TH+2, W, Cin)`` — computed ONCE per x-block (``@pl.when(j == 0)``, with
  Cout innermost in the grid) so the GN-affine + SiLU VPU pass is not
  re-run per Cout tile.
- A 3x3 SAME conv is 9 matmuls ``act[dy:dy+TH] @ W[dy,dx]``.  Row (dy)
  shifts are plain aligned slices of the scratch (halo rows included).
  Column (dx) shifts are applied to the *outputs*: with
  ``A_dx = sum_dy act[dy:dy+TH] @ W[dy,dx]`` (no input shift at all),
  ``out[:, x] = A_0[:, x-1] + A_1[:, x] + A_2[:, x+1]`` — two
  ``pltpu.roll`` ops on the W (sublane) axis of the fp32 accumulators plus
  edge-column masks, which also implements SAME zero-padding in W.  No
  per-tap patch materialization, no unaligned slices.

Grid: ``(N, H/TH, Cout/TC)``, Cout innermost so the x tile and the activated
scratch stay resident across Cout tiles.  Halo rows for the 3x3 vertical
taps are delivered as two extra size-1-row block inputs with clamped index
maps (rows i*TH-1 and (i+1)*TH); the kernel zeroes them (post-activation) at
the image borders, which implements SAME zero-padding in H.

GroupNorm statistics are computed *outside* (one XLA pass over x, fp32) and
enter as per-(sample, channel) effective scale/bias:
``eff_scale = gamma * rstd[group]``, ``eff_bias = beta - mean[group] *
eff_scale``, so the in-kernel prologue is a single fused multiply-add +
SiLU.  Dispatch/fallback and the custom VJP live in ops/conv.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
# Mosaic's default VMEM limit is conservative; the chip has more.  We ask
# for an explicit higher limit (vmem_limit_bytes below) and budget under it
# with slack for Mosaic temporaries and semaphores.
_VMEM_BUDGET = 24 * 1024 * 1024
_VMEM_LIMIT = 30 * 1024 * 1024


def _plan_bytes(th, w, c_in, tc, c_res, itemsize):
    """Estimated VMEM bytes for a (tile_h, tile_cout) choice."""
    io = 2 * th * w * c_in * itemsize        # x body, double buffered
    io += 4 * w * c_in * itemsize            # 2 halo row specs, double buffered
    io += 2 * th * w * tc * itemsize         # out, double buffered
    weights = 2 * 9 * c_in * tc * itemsize
    if c_res:
        io += 2 * th * w * c_res * itemsize  # residual, double buffered
        if c_res != tc:
            weights += 2 * c_res * tc * itemsize   # shortcut projection
    scratch = (th + 2) * w * c_in * itemsize       # activated tile
    temps = 3 * th * w * 4 * tc              # fp32 acc + per-dx A + roll temp
    return io + weights + scratch + temps


def plan_fused_conv(h, w, c_in, c_out, c_res, itemsize):
    """Pick (tile_h, tile_cout) or return None when the kernel doesn't apply.

    Constraints: channel counts must be lane multiples (the VAE stages are
    128/256/512 channels; the 16/32-channel latent-side convs fall back to
    XLA), W must be a sublane multiple, and the tile must fit VMEM.
    """
    if c_in % _LANE or c_out % _LANE or w % 8 or h < 1:
        return None
    if c_res is not None and c_res % _LANE:
        return None
    for tc in (512, 256, 128):
        if tc > c_out or c_out % tc:
            continue
        for th in (16, 8, 4, 2, 1):
            if h % th:
                continue
            if _plan_bytes(th, w, c_in, tc, c_res, itemsize) <= _VMEM_BUDGET:
                return th, tc
    return None


def _kernel(refs, *, th, w, c_in, tc, has_res, has_sc, c_res):
    if has_sc:
        (x_top, x_body, x_bot, scale_ref, bias_ref, w_ref, cb_ref,
         res_ref, sck_ref, scb_ref, o_ref, act_ref) = refs
    elif has_res:
        (x_top, x_body, x_bot, scale_ref, bias_ref, w_ref, cb_ref,
         res_ref, o_ref, act_ref) = refs
    else:
        (x_top, x_body, x_bot, scale_ref, bias_ref, w_ref, cb_ref,
         o_ref, act_ref) = refs

    i = pl.program_id(1)
    n_h = pl.num_programs(1)
    j = pl.program_id(2)
    cdt = act_ref.dtype

    # Activated tile -> scratch, once per x-block (j is innermost; the same
    # x/halo blocks stay resident across Cout tiles and so does the scratch).
    @pl.when(j == 0)
    def _():
        scale = scale_ref[0]                    # (1, Cin) fp32
        bias = bias_ref[0]

        def act(v):
            y = v.astype(jnp.float32) * scale + bias
            return (y * jax.nn.sigmoid(y)).astype(cdt)

        # SAME zero-padding in H applies to the *activated* tensor
        # (silu(eff_bias) != 0): zero halo rows at the image borders.
        top = act(x_top[0])
        act_ref[0:1] = jnp.where(i == 0, jnp.zeros_like(top), top)
        act_ref[1:th + 1] = act(x_body[0])
        bot = act(x_bot[0])
        act_ref[th + 1:th + 2] = jnp.where(i == n_h - 1,
                                           jnp.zeros_like(bot), bot)

    # A_dx = sum_dy act[dy:dy+TH] @ W[dy,dx]  — aligned slices, no copies.
    # Column shifts move to the outputs: out[:, x] += A_0[:, x-1] (roll +1,
    # wrap column masked = SAME W pad), A_1[:, x], A_2[:, x+1] (roll -1).
    # (Mosaic only rotates 32-bit data, so rolling the fp32 accumulators is
    # also the only in-kernel option for bf16 activations.)
    def tap_sum(dx):
        a = jnp.zeros((th * w, tc), jnp.float32)
        for dy in range(3):
            rows = act_ref[dy:dy + th].reshape(th * w, c_in)
            a = a + jnp.dot(
                rows, w_ref[dy * c_in:(dy + 1) * c_in, dx, :],
                preferred_element_type=jnp.float32)
        return a.reshape(th, w, tc)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, w, 1), 1)
    a0 = pltpu.roll(tap_sum(0), 1, axis=1)
    acc = jnp.where(col == 0, 0.0, a0)
    acc = acc + tap_sum(1)
    a2 = pltpu.roll(tap_sum(2), w - 1, axis=1)  # roll by -1 (shift >= 0 only)
    acc = acc + jnp.where(col == w - 1, 0.0, a2)
    acc = acc + cb_ref[:].astype(jnp.float32)   # (1, TC) broadcasts

    if has_sc:
        r = res_ref[0].reshape(th * w, c_res).astype(cdt)
        p = jnp.dot(r, sck_ref[:], preferred_element_type=jnp.float32)
        acc = acc + p.reshape(th, w, tc) + scb_ref[:].astype(jnp.float32)
    elif has_res:
        acc = acc + res_ref[0].astype(jnp.float32)

    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("tile_h", "tile_cout", "interpret"))
def gn_silu_conv3x3_pallas(x, eff_scale, eff_bias, kernel, bias,
                           residual=None, shortcut_kernel=None,
                           shortcut_bias=None, *, tile_h: int,
                           tile_cout: int, interpret: bool = False):
    """out = conv3x3_SAME(silu(x*eff_scale + eff_bias)) + bias [+ residual].

    x:          (N, H, W, Cin)
    eff_scale:  (N, Cin) fp32  — gamma * rstd[group(c)]
    eff_bias:   (N, Cin) fp32  — beta - mean[group(c)] * eff_scale
    kernel:     (3, 3, Cin, Cout) HWIO
    bias:       (Cout,)
    residual:   (N, H, W, Cout) added to the output — or, with
                shortcut_kernel, (N, H, W, Cres) projected by the 1x1
                shortcut first.
    shortcut_kernel: (1, 1, Cres, Cout) or (Cres, Cout)
    """
    n, h, w, c_in = x.shape
    c_out = kernel.shape[-1]
    th, tc = tile_h, tile_cout
    has_res = residual is not None
    has_sc = shortcut_kernel is not None
    c_res = residual.shape[-1] if has_res else None

    grid = (n, h // th, c_out // tc)
    # weights as (3*Cin, 3, Cout): w3d[dy*Cin + ci, dx, co] = kernel[dy,dx,ci,co]
    # — the one-matmul kernel contracts (3*Cin) and emits (3, TC) per block
    w3d = kernel.astype(x.dtype).transpose(0, 2, 1, 3).reshape(
        3 * c_in, 3, c_out)

    x_body_spec = pl.BlockSpec((1, th, w, c_in),
                               lambda b, i, j: (b, i, 0, 0),
                               memory_space=pltpu.VMEM)
    # halo rows: size-1 blocks along H, so the block index IS the row index
    x_top_spec = pl.BlockSpec(
        (1, 1, w, c_in),
        lambda b, i, j: (b, jnp.maximum(i * th - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    x_bot_spec = pl.BlockSpec(
        (1, 1, w, c_in),
        lambda b, i, j: (b, jnp.minimum((i + 1) * th, h - 1), 0, 0),
        memory_space=pltpu.VMEM)

    # per-sample vectors travel as (N, 1, C): Mosaic requires the last two
    # block dims be (8,128)-divisible or equal to the array dims
    in_specs = [
        x_top_spec, x_body_spec, x_bot_spec,
        pl.BlockSpec((1, 1, c_in), lambda b, i, j: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c_in), lambda b, i, j: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * c_in, 3, tc), lambda b, i, j: (0, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tc), lambda b, i, j: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, x, x,
            eff_scale.astype(jnp.float32).reshape(n, 1, c_in),
            eff_bias.astype(jnp.float32).reshape(n, 1, c_in), w3d,
            bias.astype(jnp.float32).reshape(1, c_out)]

    if has_sc:
        in_specs.append(pl.BlockSpec((1, th, w, c_res),
                                     lambda b, i, j: (b, i, 0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((c_res, tc), lambda b, i, j: (0, j),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, tc), lambda b, i, j: (0, j),
                                     memory_space=pltpu.VMEM))
        args.extend([
            residual,
            shortcut_kernel.astype(x.dtype).reshape(c_res, c_out),
            shortcut_bias.astype(jnp.float32).reshape(1, c_out)])
    elif has_res:
        in_specs.append(pl.BlockSpec((1, th, w, tc),
                                     lambda b, i, j: (b, i, 0, j),
                                     memory_space=pltpu.VMEM))
        args.append(residual)

    flops_conv = 2 * n * h * w * 9 * c_in * c_out
    if has_sc:
        flops_conv += 2 * n * h * w * c_res * c_out
    bytes_x = n * h * w * c_in * x.dtype.itemsize
    bytes_out = n * h * w * c_out * x.dtype.itemsize
    bytes_res = n * h * w * (c_res or 0) * x.dtype.itemsize

    kern = functools.partial(_kernel, th=th, w=w, c_in=c_in, tc=tc,
                             has_res=has_res, has_sc=has_sc, c_res=c_res)
    out = pl.pallas_call(
        lambda *refs: kern(refs),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, w, tc), lambda b, i, j: (b, i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c_out), x.dtype),
        scratch_shapes=[pltpu.VMEM((th + 2, w, c_in), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=flops_conv,
            bytes_accessed=bytes_x + bytes_out + bytes_res,
            transcendentals=n * h * w * c_in,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*args)
    return out
