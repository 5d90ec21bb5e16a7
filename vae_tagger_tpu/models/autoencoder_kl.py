"""FLUX AutoencoderKL in Flax, NHWC, TPU-first.

Re-implements from scratch the diffusers ``AutoencoderKL`` the reference pins
at ``/root/reference/diffusers_vae_loader.py:8-35`` (3->16 channel VAE,
4 down/up stages, channels [128,256,512,512], 2 resnet layers per encoder
block, GroupNorm(32)+SiLU, single-head attention mid block, no quant convs,
scaling 0.3611 / shift 0.1159).

API surface (functional; a frozen posterior pytree instead of a distribution
object):
  model.encode(x)        -> DiagonalGaussian (mean/logvar, NHWC)
  model.decode(z)        -> reconstruction
  model.__call__(x, rng) -> (reconstruction, posterior)      [train forward]
  encode_scaled / decode_scaled apply the scaling/shift factors exactly like
  ``DiffusersVAEWrapper.encode/decode`` (/root/reference/diffusers_vae_loader.py:78-94).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import struct

from ..core.config import VAEConfig
from ..nn.blocks import DownEncoderBlock, GroupNorm, MidBlock, UpDecoderBlock, _conv


@struct.dataclass
class DiagonalGaussian:
    """Diagonal Gaussian posterior over NHWC latents.

    Matches diffusers ``DiagonalGaussianDistribution``: logvar clamped to
    [-30, 20]; ``kl()`` is the analytic KL to N(0, I) summed over latent
    dims per sample; ``mode()`` is the mean.
    """

    mean: jnp.ndarray    # (B, h, w, C)
    logvar: jnp.ndarray  # (B, h, w, C)

    @classmethod
    def from_moments(cls, moments: jnp.ndarray) -> "DiagonalGaussian":
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return cls(mean=mean, logvar=jnp.clip(logvar, -30.0, 20.0))

    @property
    def std(self):
        return jnp.exp(0.5 * self.logvar)

    @property
    def var(self):
        return jnp.exp(self.logvar)

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        noise = jax.random.normal(rng, self.mean.shape, dtype=jnp.float32)
        return self.mean + self.std * noise.astype(self.mean.dtype)

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self) -> jnp.ndarray:
        """Per-sample KL(q || N(0,I)), summed over (h, w, C) -> (B,)."""
        m = self.mean.astype(jnp.float32)
        lv = self.logvar.astype(jnp.float32)
        return 0.5 * jnp.sum(
            jnp.square(m) + jnp.exp(lv) - 1.0 - lv, axis=(1, 2, 3)
        )


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        g = cfg.norm_num_groups
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        kw["remat"] = self.remat
        x = x.astype(self.dtype)
        x = _conv(cfg.block_out_channels[0], (3, 3), "conv_in",
                  self.dtype, self.param_dtype)(x)
        for i, out_ch in enumerate(cfg.block_out_channels):
            x = DownEncoderBlock(
                out_channels=out_ch,
                num_layers=cfg.layers_per_block,
                add_downsample=i < len(cfg.block_out_channels) - 1,
                num_groups=g,
                name=f"down_blocks_{i}",
                **kw,
            )(x)
        x = MidBlock(cfg.block_out_channels[-1],
                     add_attention=cfg.mid_block_add_attention,
                     num_groups=g, name="mid_block", **kw)(x)
        x = GroupNorm(g, with_silu=True, name="conv_norm_out",
                      param_dtype=self.param_dtype)(x)
        x = _conv(2 * cfg.latent_channels, (3, 3), "conv_out",
                  self.dtype, self.param_dtype)(x)
        return x  # moments: (B, h, w, 2*latent_channels)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        g = cfg.norm_num_groups
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        kw["remat"] = self.remat
        z = z.astype(self.dtype)
        reversed_channels = list(reversed(cfg.block_out_channels))
        x = _conv(reversed_channels[0], (3, 3), "conv_in",
                  self.dtype, self.param_dtype)(z)
        x = MidBlock(reversed_channels[0],
                     add_attention=cfg.mid_block_add_attention,
                     num_groups=g, name="mid_block", **kw)(x)
        for i, out_ch in enumerate(reversed_channels):
            x = UpDecoderBlock(
                out_channels=out_ch,
                num_layers=cfg.layers_per_block + 1,
                add_upsample=i < len(reversed_channels) - 1,
                num_groups=g,
                name=f"up_blocks_{i}",
                **kw,
            )(x)
        x = GroupNorm(g, with_silu=True, name="conv_norm_out",
                      param_dtype=self.param_dtype)(x)
        x = _conv(cfg.out_channels, (3, 3), "conv_out",
                  self.dtype, self.param_dtype)(x)
        return x


class AutoencoderKL(nn.Module):
    """The full VAE.  ``__call__`` is the training forward
    (encode -> sample -> decode), mirroring ``DiffusersVAEWrapper.forward``
    (/root/reference/diffusers_vae_loader.py:72-76)."""

    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    # rematerialize each block in the backward pass (gradient checkpointing):
    # trades ~30% extra forward FLOPs for O(stage) activation memory — the
    # TPU-native answer to the reference's CUDA fp16 memory pressure
    remat: bool = False

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  remat=self.remat)
        self.encoder = Encoder(self.config, name="encoder", **kw)
        self.decoder = Decoder(self.config, name="decoder", **kw)
        # SD-family VAEs (diffusers AutoencoderKL defaults) put 1x1 convs
        # between the encoder/decoder and the latent space; the FLUX config
        # the reference pins disables both (diffusers_vae_loader.py:102-134).
        # Named to match the diffusers checkpoint keys quant_conv.* /
        # post_quant_conv.* (io/safetensors_io.py maps them generically).
        if self.config.use_quant_conv:
            self.quant_conv = _conv(2 * self.config.latent_channels, (1, 1),
                                    "quant_conv", self.dtype,
                                    self.param_dtype)
        if self.config.use_post_quant_conv:
            self.post_quant_conv = _conv(self.config.latent_channels, (1, 1),
                                         "post_quant_conv", self.dtype,
                                         self.param_dtype)

    def encode(self, x) -> DiagonalGaussian:
        moments = self.encoder(x)
        if self.config.use_quant_conv:
            moments = self.quant_conv(moments)
        return DiagonalGaussian.from_moments(moments.astype(jnp.float32))

    def decode(self, z) -> jnp.ndarray:
        if self.config.use_post_quant_conv:
            z = self.post_quant_conv(z.astype(self.dtype))
        return self.decoder(z).astype(jnp.float32)

    def __call__(self, x, rng: jax.Array):
        posterior = self.encode(x)
        z = posterior.sample(rng)
        reconstruction = self.decode(z)
        return reconstruction, posterior


def encode_scaled(posterior_mode: jnp.ndarray, config: VAEConfig) -> jnp.ndarray:
    """latent * scaling_factor + shift_factor
    (``DiffusersVAEWrapper.encode``, /root/reference/diffusers_vae_loader.py:78-86)."""
    return posterior_mode * config.scaling_factor + config.shift_factor


def decode_scaled(z: jnp.ndarray, config: VAEConfig) -> jnp.ndarray:
    """Inverse transform before decoding
    (``DiffusersVAEWrapper.decode``, /root/reference/diffusers_vae_loader.py:88-94)."""
    return (z - config.shift_factor) / config.scaling_factor
