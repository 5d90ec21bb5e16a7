"""Tagger heads (classification decoders) in Flax, NHWC.

Re-implements the reference's decoder family from
``/root/reference/modules.py:15-124,303-485``:

  SpatialAttention              (modules.py:15-47)   CBAM channel+spatial gate
  MultiHeadSelfAttention        (modules.py:49-91)   pre-LN MHSA over spatial tokens
  CrossAttention                (modules.py:93-124)  1-query cross attention
  ClassificationDecoder         (modules.py:303-356) MLP head over 4x4-pooled latents
  AttentionClassificationDecoder(modules.py:358-485) default attention tagger head

Checkpoint compatibility: module names mirror the torch ``state_dict`` keys
(Sequential indices included, e.g. ``classifier_0``) so io/torch_bin.py maps
keys mechanically.  Flatten operations use torch's channel-major order so
Linear weights carry over without permutation.

State: BatchNorm running stats live in the ``batch_stats`` collection; dropout
draws from the ``dropout`` rng stream; pass ``deterministic=True`` for eval.
"""

from __future__ import annotations

import functools

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import AttentionDecoderConfig
from ..ops import adaptive_avg_pool_nhwc, adaptive_max_pool_nhwc


def _flatten_torch_order(x):
    """(B, H, W, C) -> (B, C*H*W) flattened channel-major like torch NCHW."""
    b = x.shape[0]
    return jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)


class SpatialAttention(nn.Module):
    """CBAM-style gate: channel attention (shared 1x1-conv bottleneck over
    avg- and max-pooled descriptors) then spatial attention (7x7 conv over
    channel mean/max maps), each multiplied into the feature map."""

    reduction_ratio: int = 8
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        # clamp to >= 1: for narrow latents (SD's 4 channels with the default
        # reduction 8) the reference's nn.Conv2d(C, C//8, 1) is a hard error
        # (modules.py:20-24) — a 1-channel bottleneck keeps the gate usable
        # there and is identical wherever the reference runs at all
        hidden = max(1, c // self.reduction_ratio)
        conv = lambda feats, ksize, name, pad="SAME": nn.Conv(
            feats, ksize, padding=pad, use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name)

        ca_0 = conv(hidden, (1, 1), "channel_att_0")
        ca_2 = conv(c, (1, 1), "channel_att_2")
        avg_desc = adaptive_avg_pool_nhwc(x, 1)          # (B,1,1,C)
        max_desc = adaptive_max_pool_nhwc(x, 1)
        avg_out = ca_2(nn.relu(ca_0(avg_desc)))
        max_out = ca_2(nn.relu(ca_0(max_desc)))
        channel_att = nn.sigmoid(avg_out + max_out)
        self.sow("intermediates", "channel_attention", channel_att)
        x = x * channel_att

        avg_spatial = jnp.mean(x, axis=-1, keepdims=True)
        max_spatial = jnp.max(x, axis=-1, keepdims=True)
        spatial = jnp.concatenate([avg_spatial, max_spatial], axis=-1)
        spatial_att = nn.sigmoid(conv(1, (7, 7), "spatial_att_0")(spatial))
        self.sow("intermediates", "spatial_attention", spatial_att)
        return x * spatial_att


class MultiHeadSelfAttention(nn.Module):
    """Pre-LayerNorm MHSA over the flattened spatial sequence of an NHWC map,
    with dropout on the attention weights and a residual add."""

    embed_dim: int
    num_heads: int = 8
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, h, w, c = x.shape
        assert c == self.embed_dim
        head_dim = self.embed_dim // self.num_heads
        if head_dim * self.num_heads != self.embed_dim:
            # same constraint as torch nn.MultiheadAttention
            # (/root/reference/modules.py:57); narrow latents (SD's 4ch ->
            # 2ch compressed) need fewer heads or the plain head
            raise ValueError(
                f"embed_dim {self.embed_dim} is not divisible by num_heads "
                f"{self.num_heads}; pass --attention_heads <divisor> or "
                f"--no_attention for narrow-latent VAEs")

        seq = x.reshape(b, h * w, c)
        residual = seq
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(seq)
        dense = lambda name: nn.Dense(self.embed_dim, dtype=self.dtype,
                                      param_dtype=self.param_dtype, name=name)
        s = h * w
        def heads(t):
            return t.reshape(b, s, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        q = heads(dense("q_proj")(y))
        k = heads(dense("k_proj")(y))
        v = heads(dense("v_proj")(y))
        scores = jnp.einsum("bnqd,bnkd->bnqk", q, k) / (head_dim ** 0.5)
        weights = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        self.sow("intermediates", "attention_weights", weights)
        weights = nn.Dropout(self.dropout, name="attn_dropout")(
            weights, deterministic=deterministic)
        out = jnp.einsum("bnqk,bnkd->bnqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, self.embed_dim)
        out = dense("out_proj")(out) + residual
        return out.reshape(b, h, w, c)


class CrossAttention(nn.Module):
    """One query vector attending over a spatial K/V sequence; residual to the
    query.  (Off by default — ``use_cross_attention`` flag.)"""

    embed_dim: int = 256
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key_value):
        # query: (B, Qd); key_value: (B, S, Kd)
        b = query.shape[0]
        qd = query.shape[-1]
        head_dim = self.embed_dim // self.num_heads
        dense = lambda feats, name: nn.Dense(
            feats, dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        q = dense(self.embed_dim, "q_proj")(query).reshape(
            b, 1, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        k = dense(self.embed_dim, "k_proj")(key_value).reshape(
            b, -1, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        v = dense(self.embed_dim, "v_proj")(key_value).reshape(
            b, -1, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bnqd,bnkd->bnqk", q, k) / (head_dim ** 0.5)
        weights = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        self.sow("intermediates", "attention_weights", weights)
        out = jnp.einsum("bnqk,bnkd->bnqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, self.embed_dim)
        return dense(qd, "out_proj")(out) + query


class ClassificationDecoder(nn.Module):
    """MLP head: AdaptiveAvgPool(4,4) -> Linear 512 -> LN -> LeakyReLU(0.2) ->
    Dropout(0.3) -> Linear 256 -> LN -> LeakyReLU -> Dropout(0.2) -> logits."""

    num_classes: int
    use_adaptive_pooling: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latents, deterministic: bool = True):
        # latents: (B, h, w, C) scaled/shifted mode latents
        if self.use_adaptive_pooling:
            x = adaptive_avg_pool_nhwc(latents, (4, 4))
        else:
            x = latents
        x = _flatten_torch_order(x)
        dense = lambda feats, name: nn.Dense(
            feats, dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                       param_dtype=self.param_dtype, name=name)
        x = dense(512, "classifier_0")(x)
        x = ln("classifier_1")(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = nn.Dropout(0.3)(x, deterministic=deterministic)
        x = dense(256, "classifier_4")(x)
        x = ln("classifier_5")(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = nn.Dropout(0.2)(x, deterministic=deterministic)
        return dense(self.num_classes, "classifier_8")(x)


class AttentionClassificationDecoder(nn.Module):
    """The default tagger head: optional CBAM gate on the raw latent ->
    3x3 conv compress C -> C/2 + BatchNorm + ReLU + AdaptiveAvgPool(8,8) ->
    optional MHSA over the 64 tokens -> 4-layer MLP -> logits.
    Optional 1-query cross-attention branch mixed into the flattened features.
    """

    latent_channels: int
    num_classes: int
    attention: AttentionDecoderConfig = AttentionDecoderConfig()
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latents, deterministic: bool = True):
        cfg = self.attention
        x = latents
        if cfg.use_spatial_attention:
            x = SpatialAttention(dtype=self.dtype, param_dtype=self.param_dtype,
                                 name="spatial_attention")(x)

        compressed_ch = self.latent_channels // 2
        x = nn.Conv(compressed_ch, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=self.param_dtype, name="feature_compress_0")(x)
        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name="feature_compress_1")(x)
        x = nn.relu(x)
        x = adaptive_avg_pool_nhwc(x, (8, 8))

        if cfg.use_self_attention:
            x = MultiHeadSelfAttention(
                embed_dim=compressed_ch, num_heads=cfg.attention_heads,
                dropout=cfg.attention_dropout, dtype=self.dtype,
                param_dtype=self.param_dtype, name="self_attention_post",
            )(x, deterministic=deterministic)

        flattened = _flatten_torch_order(x)  # (B, compressed_ch * 64)

        if cfg.use_cross_attention:
            query = nn.Dense(512, dtype=self.dtype, param_dtype=self.param_dtype,
                             name="query_generator")(flattened)
            # spatial K/V: (B, S, compressed_ch) in torch's (C, S)->transpose order
            b = x.shape[0]
            spatial = jnp.transpose(x, (0, 3, 1, 2)).reshape(
                b, compressed_ch, -1).transpose(0, 2, 1)
            attended = CrossAttention(
                embed_dim=256, num_heads=cfg.attention_heads, dtype=self.dtype,
                param_dtype=self.param_dtype, name="cross_attention",
            )(query, spatial)
            # reference mixes the *mean* of the attended query back in
            # (modules.py:459)
            flattened = flattened + jnp.broadcast_to(
                jnp.mean(attended, axis=1, keepdims=True), flattened.shape)

        dense = lambda feats, name: nn.Dense(
            feats, dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                       param_dtype=self.param_dtype, name=name)
        y = dense(1024, "classifier_0")(flattened)
        y = ln("classifier_1")(y)
        y = nn.relu(y)
        y = nn.Dropout(0.3)(y, deterministic=deterministic)
        y = dense(512, "classifier_4")(y)
        y = ln("classifier_5")(y)
        y = nn.relu(y)
        y = nn.Dropout(0.2)(y, deterministic=deterministic)
        y = dense(256, "classifier_8")(y)
        y = ln("classifier_9")(y)
        y = nn.relu(y)
        y = nn.Dropout(0.1)(y, deterministic=deterministic)
        return dense(self.num_classes, "classifier_12")(y)


@functools.partial(jax.jit, static_argnums=0)
def _sow_forward(decoder, variables, latents):
    # one compiled program per decoder config: eager apply would dispatch
    # every op individually (~100ms RTT each on this host)
    return decoder.apply(variables, latents, deterministic=True,
                         mutable=["intermediates"])


def get_attention_maps(decoder, variables, latents) -> dict:
    """Extract attention maps for visualization (one eval forward).

    Improves on the reference, whose method is an empty stub
    (``/root/reference/modules.py:477-485``): the modules ``sow`` their
    attention tensors into the ``intermediates`` collection, and this runs
    one deterministic forward with that collection mutable.

    Returns a flat dict (missing keys when the head disables a branch):
      channel_attention: (B, 1, 1, C)   CBAM channel gate (sigmoid)
      spatial_attention: (B, H, W, 1)   CBAM spatial gate (sigmoid)
      self_attention:    (B, heads, S, S) MHSA softmax weights (pre-dropout)
      cross_attention:   (B, heads, 1, S) cross-attention weights
    """
    _, inters = _sow_forward(decoder, variables, latents)
    tree = inters.get("intermediates", {})
    maps = {}
    renames = {
        ("spatial_attention", "channel_attention"): "channel_attention",
        ("spatial_attention", "spatial_attention"): "spatial_attention",
        ("self_attention_post", "attention_weights"): "self_attention",
        ("cross_attention", "attention_weights"): "cross_attention",
    }
    for (module, leaf), name in renames.items():
        value = tree.get(module, {}).get(leaf)
        if value is not None:
            maps[name] = value[0]  # sow stores a 1-tuple per call site
    return maps


def create_attention_decoder(latent_channels: int, num_classes: int,
                             attention_config: Optional[dict] = None,
                             dtype=jnp.float32, param_dtype=jnp.float32):
    """Factory mirroring ``/root/reference/modules.py:731-748``: no attention
    config -> plain ``ClassificationDecoder``, else the attention head."""
    if attention_config is None:
        return ClassificationDecoder(num_classes=num_classes, dtype=dtype,
                                     param_dtype=param_dtype)
    cfg = AttentionDecoderConfig(
        use_spatial_attention=attention_config.get("use_spatial_attention", True),
        use_self_attention=attention_config.get("use_self_attention", True),
        use_cross_attention=attention_config.get("use_cross_attention", False),
        attention_heads=attention_config.get("attention_heads", 8),
        attention_dropout=attention_config.get("attention_dropout", 0.1),
    )
    return AttentionClassificationDecoder(
        latent_channels=latent_channels, num_classes=num_classes,
        attention=cfg, dtype=dtype, param_dtype=param_dtype)
