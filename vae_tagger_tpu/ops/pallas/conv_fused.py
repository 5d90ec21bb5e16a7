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

Decomposition: a 3x3 SAME conv over an NHWC tile is 9 shifted
``(TH*W, Cin) @ (Cin, Cout)`` matmuls accumulated in fp32 on the MXU.

Grid: ``(N, H/TH, Cout/TC)``, Cout innermost so the x tile (whose index map
ignores the Cout coordinate) stays resident in VMEM across Cout tiles.
Halo rows for the 3x3 vertical taps are delivered as two extra size-1-row
block inputs with clamped index maps (rows i*TH-1 and (i+1)*TH); the kernel
zeroes them at the image borders, which implements SAME zero-padding in H.
W is never tiled (full rows live in VMEM), so SAME padding in W is an
in-VMEM zero pad of the activated tile.

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
# Scoped VMEM is ~16MB; leave slack for Mosaic temporaries and semaphores.
_VMEM_BUDGET = 13 * 1024 * 1024


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
    temps = 2 * (th + 2) * (w + 2) * c_in * itemsize  # activated tile + pad
    temps += th * w * 4 * tc                 # fp32 accumulator
    temps += th * w * c_in * itemsize        # shifted patch materialization
    return io + weights + temps


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
         res_ref, sck_ref, scb_ref, o_ref) = refs
    elif has_res:
        (x_top, x_body, x_bot, scale_ref, bias_ref, w_ref, cb_ref,
         res_ref, o_ref) = refs
    else:
        (x_top, x_body, x_bot, scale_ref, bias_ref, w_ref, cb_ref,
         o_ref) = refs

    i = pl.program_id(1)
    n_h = pl.num_programs(1)
    cdt = x_body.dtype

    # assemble (TH+2, W, Cin): halo rows above/below the body tile
    xf = jnp.concatenate([x_top[0], x_body[0], x_bot[0]],
                         axis=0).astype(jnp.float32)

    # GN prologue: per-(sample, channel) effective affine, then SiLU
    y = xf * scale_ref[0] + bias_ref[0]  # (1, 1, C) blocks broadcast
    y = y * jax.nn.sigmoid(y)
    # SAME zero-padding in H applies to the *activated* tensor: zero the
    # halo rows at the image borders (silu(eff_bias) != 0).
    row = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
    border = ((row == 0) & (i == 0)) | ((row == th + 1) & (i == n_h - 1))
    y = jnp.where(border, 0.0, y).astype(cdt)
    yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0)))          # SAME zero pad in W

    # conv bias starts the fp32 accumulator
    acc = jnp.broadcast_to(cb_ref[:].astype(jnp.float32), (th * w, tc))
    for tap in range(9):
        dy, dx = divmod(tap, 3)
        patch = yp[dy:dy + th, dx:dx + w, :].reshape(th * w, c_in)
        acc = acc + jnp.dot(patch, w_ref[tap * c_in:(tap + 1) * c_in, :],
                            preferred_element_type=jnp.float32)

    if has_sc:
        r = res_ref[0].reshape(th * w, c_res).astype(cdt)
        acc = acc + jnp.dot(r, sck_ref[:], preferred_element_type=jnp.float32)
        acc = acc + scb_ref[:].astype(jnp.float32)
    elif has_res:
        acc = acc + res_ref[0].reshape(th * w, tc).astype(jnp.float32)

    o_ref[0] = acc.reshape(th, w, tc).astype(o_ref.dtype)


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
    # 3x3 taps flattened tap-major: w2d[tap*Cin:(tap+1)*Cin] == kernel[dy,dx]
    w2d = kernel.astype(x.dtype).reshape(9 * c_in, c_out)

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
        pl.BlockSpec((9 * c_in, tc), lambda b, i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tc), lambda b, i, j: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, x, x,
            eff_scale.astype(jnp.float32).reshape(n, 1, c_in),
            eff_bias.astype(jnp.float32).reshape(n, 1, c_in), w2d,
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
        cost_estimate=pl.CostEstimate(
            flops=flops_conv,
            bytes_accessed=bytes_x + bytes_out + bytes_res,
            transcendentals=n * h * w * c_in,
        ),
        interpret=interpret,
    )(*args)
    return out
