"""Tagger head parity vs the torch oracle + decoder .bin interchange."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import torch

from vae_tagger_tpu.core.config import AttentionDecoderConfig
from vae_tagger_tpu.io.torch_bin import load_decoder_params, save_decoder_bin
from vae_tagger_tpu.io.safetensors_io import flax_params_from_torch_state
from vae_tagger_tpu.models.taggers import (
    AttentionClassificationDecoder,
    ClassificationDecoder,
)

from torch_oracle.taggers_torch import (
    AttentionDecoderOracle,
    ClassificationDecoderOracle,
)

C, NUM_CLASSES = 16, 12


def _split_bn(state):
    params, stats = {}, {}
    for k, v in state.items():
        if k.endswith(("running_mean", "running_var", "num_batches_tracked")):
            stats[k] = v
        else:
            params[k] = v
    return params, stats


def test_classification_decoder_parity():
    torch.manual_seed(0)
    oracle = ClassificationDecoderOracle(C, NUM_CLASSES).eval()
    state = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = flax_params_from_torch_state(state)

    rng = np.random.default_rng(0)
    z = rng.normal(size=(3, 8, 8, C)).astype(np.float32)
    with torch.no_grad():
        logits_t = oracle(torch.from_numpy(z).permute(0, 3, 1, 2)).numpy()

    model = ClassificationDecoder(num_classes=NUM_CLASSES)
    logits_j = jax.jit(
        lambda p, z: model.apply({"params": p}, z, deterministic=True)
    )(params, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(logits_j), logits_t,
                               rtol=1e-4, atol=1e-5)


@functools.lru_cache(maxsize=None)
def _attention_pair():
    torch.manual_seed(1)
    oracle = AttentionDecoderOracle(C, NUM_CLASSES).eval()
    state = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params_state, _ = _split_bn(state)
    params = flax_params_from_torch_state(params_state)
    model = AttentionClassificationDecoder(
        latent_channels=C, num_classes=NUM_CLASSES,
        attention=AttentionDecoderConfig())
    return oracle, model, params, state


def test_attention_decoder_parity():
    oracle, model, params, state = _attention_pair()
    # load running stats through the real .bin path
    batch_stats = {}
    from vae_tagger_tpu.io.safetensors_io import _torch_key_to_flax_path
    for k, v in state.items():
        if k.endswith("running_mean") or k.endswith("running_var"):
            merged = k.replace(".running_mean", ".mean").replace(
                ".running_var", ".var")
            path, leaf = _torch_key_to_flax_path(merged)
            node = batch_stats
            for p in path:
                node = node.setdefault(p, {})
            node[leaf] = np.asarray(v)

    rng = np.random.default_rng(1)
    z = rng.normal(size=(2, 8, 8, C)).astype(np.float32)
    with torch.no_grad():
        logits_t = oracle(torch.from_numpy(z).permute(0, 3, 1, 2)).numpy()
    logits_j = jax.jit(
        lambda v, z: model.apply(v, z, deterministic=True)
    )({"params": params, "batch_stats": batch_stats}, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(logits_j), logits_t,
                               rtol=1e-4, atol=1e-5)


def test_decoder_bin_interchange(tmp_path):
    """save_decoder_bin output must load into the torch oracle and reproduce
    identical logits (the reference's pytorch_model.bin contract)."""
    oracle, model, params, state = _attention_pair()
    # round trip: torch state -> .bin -> flax (params+stats) -> .bin -> torch
    path = str(tmp_path / "decoder.bin")
    torch.save({k: torch.from_numpy(np.asarray(v).copy())
                for k, v in state.items()}, path)
    params2, stats2 = load_decoder_params(path)
    out_path = str(tmp_path / "decoder_out.bin")
    save_decoder_bin(params2, stats2, out_path)

    reloaded = torch.load(out_path, map_location="cpu", weights_only=True)
    oracle2 = AttentionDecoderOracle(C, NUM_CLASSES)
    missing, unexpected = oracle2.load_state_dict(reloaded, strict=False)
    assert not unexpected, unexpected
    # only num_batches_tracked may be missing
    assert all("num_batches_tracked" in k for k in missing), missing
    oracle2.eval()

    rng = np.random.default_rng(2)
    z = rng.normal(size=(2, 8, 8, C)).astype(np.float32)
    with torch.no_grad():
        a = oracle(torch.from_numpy(z).permute(0, 3, 1, 2)).numpy()
        b = oracle2(torch.from_numpy(z).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_get_attention_maps_real():
    """get_attention_maps returns the sown CBAM gates and MHSA weights
    (the reference's method is an empty stub, modules.py:477-485)."""
    from vae_tagger_tpu.models.taggers import get_attention_maps

    _, model, params, state = _attention_pair()
    batch_stats = {}
    from vae_tagger_tpu.io.safetensors_io import _torch_key_to_flax_path
    for k, v in state.items():
        if k.endswith("running_mean") or k.endswith("running_var"):
            merged = k.replace(".running_mean", ".mean").replace(
                ".running_var", ".var")
            path, leaf = _torch_key_to_flax_path(merged)
            node = batch_stats
            for p in path:
                node = node.setdefault(p, {})
            node[leaf] = np.asarray(v)

    rng = np.random.default_rng(2)
    z = jnp.asarray(rng.normal(size=(2, 8, 8, C)), jnp.float32)
    maps = get_attention_maps(
        model, {"params": params, "batch_stats": batch_stats}, z)
    assert maps["channel_attention"].shape == (2, 1, 1, C)
    assert maps["spatial_attention"].shape == (2, 8, 8, 1)
    # MHSA runs over the 8x8=64 pooled tokens with 8 heads
    assert maps["self_attention"].shape == (2, 8, 64, 64)
    # gates are sigmoids, weights are softmax rows
    for k in ("channel_attention", "spatial_attention"):
        v = np.asarray(maps[k])
        assert (v >= 0).all() and (v <= 1).all()
    np.testing.assert_allclose(
        np.asarray(maps["self_attention"]).sum(-1), 1.0, rtol=1e-5)
    assert "cross_attention" not in maps  # branch disabled by default
