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
import jax.numpy as jnp

from ..ops.normalization import group_norm_silu
from ..ops.attention import spatial_single_head_attention


class GroupNorm(nn.Module):
    """GroupNorm with torch parameter semantics (consecutive-channel groups).

    ``with_silu=True`` fuses the following SiLU into the norm — on TPU this
    dispatches to the single-HBM-pass Pallas kernel
    (ops/pallas/groupnorm_silu.py); parameters and naming are unchanged, so
    checkpoints are unaffected.
    """

    num_groups: int = 32
    eps: float = 1e-6
    with_silu: bool = False
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        return group_norm_silu(x, scale, bias, num_groups=self.num_groups,
                               eps=self.eps, apply_silu=self.with_silu)


def _conv(features, kernel, name, dtype, param_dtype, strides=(1, 1), padding="SAME"):
    return nn.Conv(
        features=features,
        kernel_size=kernel,
        strides=strides,
        padding=padding,
        dtype=dtype,
        param_dtype=param_dtype,
        name=name,
    )


class ResnetBlock(nn.Module):
    """GroupNorm -> SiLU -> Conv3x3, twice, plus (1x1-projected) residual."""

    out_channels: int
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        h = GroupNorm(self.num_groups, with_silu=True, name="norm1",
                      param_dtype=self.param_dtype)(x)
        h = _conv(self.out_channels, (3, 3), "conv1", self.dtype, self.param_dtype)(h)
        h = GroupNorm(self.num_groups, with_silu=True, name="norm2",
                      param_dtype=self.param_dtype)(h)
        h = _conv(self.out_channels, (3, 3), "conv2", self.dtype, self.param_dtype)(h)
        if in_channels != self.out_channels:
            x = _conv(self.out_channels, (1, 1), "conv_shortcut",
                      self.dtype, self.param_dtype)(x)
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
        return nn.Conv(
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
