"""Flax building blocks for the FLUX AutoencoderKL, NHWC layout.

These re-implement, TPU-first, the diffusers block semantics the reference
model is built from (``AutoencoderKL`` instantiated at
``/root/reference/diffusers_vae_loader.py:8-35``): ResnetBlock2D with
GroupNorm(32, eps=1e-6)+SiLU, asymmetric-padded stride-2 downsample,
nearest-2x upsample, and a single-head attention mid block.

Layout notes:
- NHWC everywhere (TPU conv native layout); checkpoints store NCHW/OIHW and
  are transposed at the I/O boundary (io/safetensors_io.py).
- Module names mirror the diffusers state-dict key structure so the key
  mapping in io/ stays mechanical.
- GroupNorm stats run in fp32; convs/matmuls run in the policy compute dtype.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.conv import conv2d_slabbed, gn_silu_conv3x3, slab_eligible
from ..ops.normalization import group_norm_silu
from ..ops.attention import spatial_single_head_attention


class GroupNorm(nn.Module):
    """GroupNorm with torch parameter semantics (consecutive-channel groups).

    ``with_silu=True`` fuses the following SiLU into the norm — on TPU this
    dispatches to the single-HBM-pass Pallas kernel
    (ops/pallas/groupnorm_silu.py); parameters and naming are unchanged, so
    checkpoints are unaffected.  ``return_params=True`` hands the raw affine
    params to the caller instead of applying the norm (used by the fused
    GN+SiLU+conv path in ResnetBlock).
    """

    num_groups: int = 32
    eps: float = 1e-6
    with_silu: bool = False
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, return_params: bool = False):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        if return_params:
            return scale, bias
        return group_norm_silu(x, scale, bias, num_groups=self.num_groups,
                               eps=self.eps, apply_silu=self.with_silu)


class Conv2D(nn.Module):
    """NHWC conv with nn.Conv-compatible params ("kernel" HWIO, "bias").

    Exists so the fused ResnetBlock path can read the raw weights
    (``return_weights=True``) while the unfused path applies the identical
    convolution — checkpoints are interchangeable with nn.Conv.

    Under an ``ops.conv.slab_trace(n)`` trace context, eligible 3x3 convs
    run H-folded into n slabs per image (full sublane rows at tiny batch,
    same arithmetic via explicit halo rows) — see ops/conv.py.
    """

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: object = "SAME"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, return_weights: bool = False):
        c_in = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (*self.kernel_size, c_in, self.features),
                            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        if return_weights:
            return kernel, bias
        if slab_eligible(x.shape, kernel.shape, self.strides, self.padding):
            return conv2d_slabbed(
                x.astype(self.dtype), kernel.astype(self.dtype),
                bias.astype(self.dtype), strides=self.strides)
        from ..ops.conv import conv_nhwc

        out = conv_nhwc(x.astype(self.dtype), kernel.astype(self.dtype),
                        self.strides, self.padding)
        return out + bias.astype(self.dtype)


def _conv(features, kernel, name, dtype, param_dtype, strides=(1, 1), padding="SAME"):
    # Conv2D is param-compatible with nn.Conv ("kernel" HWIO lecun-normal,
    # "bias" zeros) and additionally slab-aware under slab_trace().
    return Conv2D(
        features=features,
        kernel_size=kernel,
        strides=strides,
        padding=padding,
        dtype=dtype,
        param_dtype=param_dtype,
        name=name,
    )


def _fused_resnet_plan(x_shape, out_channels, itemsize):
    """(plan1, plan2) for the two GN+conv pairs, or None to run unfused.

    Both pairs must qualify — mixing fused/unfused within a block would
    still materialize the intermediate it is trying to avoid.
    """
    from ..ops import backend
    from ..ops.pallas.conv_fused import plan_fused_conv

    if not backend.use_pallas("conv_fused"):
        return None
    n, h, w, c_in = x_shape
    p1 = plan_fused_conv(h, w, c_in, out_channels, None, itemsize)
    p2 = plan_fused_conv(h, w, out_channels, out_channels, c_in, itemsize)
    if p1 is None or p2 is None:
        return None
    return p1, p2


class ResnetBlock(nn.Module):
    """GroupNorm -> SiLU -> Conv3x3, twice, plus (1x1-projected) residual.

    On TPU at admissible shapes the two GN+SiLU+conv pairs (and the residual
    add / 1x1 shortcut) run as fused Pallas kernels (ops/pallas/conv_fused.py)
    — the north-star fusion replacing the reference's cuDNN conv stacks
    (``/root/reference/diffusers_vae_loader.py:8-35``).  Parameter trees are
    identical in both paths.
    """

    out_channels: int
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        norm1 = GroupNorm(self.num_groups, with_silu=True, name="norm1",
                          param_dtype=self.param_dtype)
        conv1 = Conv2D(self.out_channels, (3, 3), name="conv1",
                       dtype=self.dtype, param_dtype=self.param_dtype)
        norm2 = GroupNorm(self.num_groups, with_silu=True, name="norm2",
                          param_dtype=self.param_dtype)
        conv2 = Conv2D(self.out_channels, (3, 3), name="conv2",
                       dtype=self.dtype, param_dtype=self.param_dtype)
        shortcut = None
        if in_channels != self.out_channels:
            shortcut = Conv2D(self.out_channels, (1, 1), name="conv_shortcut",
                              dtype=self.dtype, param_dtype=self.param_dtype)

        if _fused_resnet_plan(x.shape, self.out_channels,
                              jnp.dtype(self.dtype).itemsize) is not None:
            s1, b1 = norm1(x, return_params=True)
            k1, cb1 = conv1(x, return_weights=True)
            s2, b2 = norm2(jnp.zeros((1, 1, 1, self.out_channels), x.dtype),
                           return_params=True)
            k2, cb2 = conv2(jnp.zeros((1, 1, 1, self.out_channels), x.dtype),
                            return_weights=True)
            xc = x.astype(self.dtype)
            h = gn_silu_conv3x3(xc, s1, b1, k1, cb1,
                                num_groups=self.num_groups)
            if shortcut is not None:
                sck, scb = shortcut(x, return_weights=True)
                return gn_silu_conv3x3(h, s2, b2, k2, cb2, residual=xc,
                                       shortcut_kernel=sck, shortcut_bias=scb,
                                       num_groups=self.num_groups)
            return gn_silu_conv3x3(h, s2, b2, k2, cb2, residual=xc,
                                   num_groups=self.num_groups)

        h = norm1(x)
        h = conv1(h)
        h = norm2(h)
        h = conv2(h)
        if shortcut is not None:
            x = shortcut(x)
        return x + h


class Downsample(nn.Module):
    """Stride-2 3x3 conv with asymmetric (0,1,0,1) padding — i.e. one pixel of
    zero padding on the right/bottom edge only, matching torch
    ``F.pad(x, (0,1,0,1))`` + padding-0 conv."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return Conv2D(
            features=self.out_channels,
            kernel_size=(3, 3),
            strides=(2, 2),
            padding=((0, 1), (0, 1)),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)


class Upsample(nn.Module):
    """Nearest-neighbor 2x then 3x3 conv."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        # nearest 2x: repeat rows/cols (XLA lowers to a cheap broadcast-reshape)
        x = jnp.repeat(x, 2, axis=1)
        x = jnp.repeat(x, 2, axis=2)
        return _conv(self.out_channels, (3, 3), "conv", self.dtype, self.param_dtype)(x)


class VAEAttention(nn.Module):
    """Single-head spatial self-attention with residual (mid-block).

    Matches the diffusers VAE attention: GroupNorm(32, eps 1e-6) on the input,
    Q/K/V/out linear projections with bias, one head of dim == channels,
    fp32 softmax, residual add.  The attention itself dispatches to the Pallas
    flash kernel on TPU (ops/attention.py).
    """

    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        n, h, w, c = x.shape
        y = GroupNorm(self.num_groups, name="group_norm",
                      param_dtype=self.param_dtype)(x)
        y = y.reshape(n, h * w, c)
        dense = lambda name: nn.Dense(c, dtype=self.dtype,
                                      param_dtype=self.param_dtype, name=name)
        q = dense("to_q")(y)
        k = dense("to_k")(y)
        v = dense("to_v")(y)
        o = spatial_single_head_attention(q, k, v)
        o = dense("to_out_0")(o)
        return o.reshape(n, h, w, c) + residual


class MidBlock(nn.Module):
    """resnet -> (attention) -> resnet at the bottleneck."""

    channels: int
    add_attention: bool = True
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        res_cls = nn.remat(ResnetBlock) if self.remat else ResnetBlock
        attn_cls = nn.remat(VAEAttention) if self.remat else VAEAttention
        kw = dict(num_groups=self.num_groups, dtype=self.dtype,
                  param_dtype=self.param_dtype)
        x = res_cls(self.channels, name="resnets_0", **kw)(x)
        if self.add_attention:
            x = attn_cls(num_groups=self.num_groups, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="attentions_0")(x)
        x = res_cls(self.channels, name="resnets_1", **kw)(x)
        return x


class DownEncoderBlock(nn.Module):
    """N resnets then optional stride-2 downsample."""

    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        res_cls = nn.remat(ResnetBlock) if self.remat else ResnetBlock
        for i in range(self.num_layers):
            x = res_cls(self.out_channels, num_groups=self.num_groups,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name=f"resnets_{i}")(x)
        if self.add_downsample:
            x = Downsample(self.out_channels, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="downsamplers_0")(x)
        return x


class UpDecoderBlock(nn.Module):
    """N+1 resnets then optional nearest-2x upsample."""

    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        res_cls = nn.remat(ResnetBlock) if self.remat else ResnetBlock
        for i in range(self.num_layers):
            x = res_cls(self.out_channels, num_groups=self.num_groups,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name=f"resnets_{i}")(x)
        if self.add_upsample:
            x = Upsample(self.out_channels, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="upsamplers_0")(x)
        return x
