"""Functional ops tests: pooling parity vs torch + differentiability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vae_tagger_tpu.ops import adaptive_avg_pool_nhwc, adaptive_max_pool_nhwc
from vae_tagger_tpu.ops.image import normalize_uint8
from vae_tagger_tpu.ops.normalization import group_norm, layer_norm


@pytest.mark.parametrize("in_hw,out_hw", [
    ((16, 16), (8, 8)),   # even division
    ((16, 16), (4, 4)),
    ((7, 9), (4, 4)),     # uneven bins
    ((8, 8), (1, 1)),
])
def test_adaptive_avg_pool_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, *in_hw, 5)).astype(np.float32)
    ours = adaptive_avg_pool_nhwc(jnp.asarray(x), out_hw)
    ref = F.adaptive_avg_pool2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), out_hw
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-6)


def test_adaptive_max_pool_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 8, 8, 5)).astype(np.float32)
    for out in ((1, 1), (4, 4)):
        ours = adaptive_max_pool_nhwc(jnp.asarray(x), out)
        ref = F.adaptive_max_pool2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), out
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-6)


def test_pooling_is_differentiable():
    """Regression: the even-division pool must have a reverse-mode rule
    (a generic lax.reduce_window does not — broke train steps on TPU)."""
    x = jnp.ones((1, 16, 16, 4))
    g = jax.grad(lambda x: jnp.sum(adaptive_avg_pool_nhwc(x, (8, 8)) ** 2))(x)
    assert g.shape == x.shape
    g = jax.grad(lambda x: jnp.sum(adaptive_max_pool_nhwc(x, (4, 4)) ** 2))(x)
    assert g.shape == x.shape


def test_group_norm_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
    scale = rng.normal(size=8).astype(np.float32)
    bias = rng.normal(size=8).astype(np.float32)
    ours = group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
                      num_groups=4, eps=1e-6)
    gn = torch.nn.GroupNorm(4, 8, eps=1e-6)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(scale))
        gn.bias.copy_(torch.from_numpy(bias))
        ref = gn(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref.transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def test_layer_norm_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 16)).astype(np.float32)
    scale = rng.normal(size=16).astype(np.float32)
    bias = rng.normal(size=16).astype(np.float32)
    ours = layer_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias))
    ref = F.layer_norm(torch.from_numpy(x), (16,),
                       torch.from_numpy(scale), torch.from_numpy(bias)).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-6)


def test_normalize_uint8_matches_torchvision():
    """x/255 then Normalize(0.5, 0.5) == x/127.5 - 1."""
    px = np.arange(0, 256, dtype=np.uint8).reshape(1, 16, 16, 1)
    ours = np.asarray(normalize_uint8(jnp.asarray(px)))
    ref = (px.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(ours, ref, rtol=1e-6)
    assert ours.min() == -1.0 and ours.max() == 1.0