"""Checkpoint I/O tests: safetensors roundtrip, orbax train-state resume,
cross-attention parity (the remaining head branch)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from vae_tagger_tpu.core.config import AttentionDecoderConfig, default_flux_vae_config
from vae_tagger_tpu.io.safetensors_io import (
    flax_params_from_torch_state,
    load_vae_pretrained_dir,
    save_vae_pretrained,
)
from vae_tagger_tpu.io.orbax_io import restore_train_state, save_train_state
from vae_tagger_tpu.models.taggers import CrossAttention
from vae_tagger_tpu.train.state import TrainState, build_optimizer

from torch_oracle.taggers_torch import CrossAttentionOracle


def test_vae_pretrained_dir_roundtrip(tmp_path):
    cfg = default_flux_vae_config(block_out_channels=(8, 8, 8, 8),
                                  norm_num_groups=4, latent_channels=4)
    from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL

    model = AutoencoderKL(cfg)
    params = jax.jit(model.init)({"params": jax.random.key(0)},
                                 jnp.zeros((1, 16, 16, 3)),
                                 jax.random.key(1))["params"]
    out = str(tmp_path / "vae")
    save_vae_pretrained(params, cfg, out)
    assert os.path.exists(os.path.join(out, "config.json"))
    cfg2, params2 = load_vae_pretrained_dir(out)
    assert cfg2 == cfg
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 params, params2)


def test_orbax_train_state_resume(tmp_path):
    params = {"w": jnp.arange(8, dtype=jnp.float32),
              "nested": {"b": jnp.ones((2, 2))}}
    tx = build_optimizer(optax.constant_schedule(1e-3), 1e-6, 1.0, 1)
    state = TrainState.create(params, tx, batch_stats={"m": jnp.zeros(3)})

    grads = jax.tree.map(jnp.ones_like, params)
    state = state.apply_gradients(grads)
    state = state.apply_gradients(grads)
    assert int(state.step) == 2

    path = str(tmp_path / "ckpt")
    save_train_state(state, path)

    fresh = TrainState.create(
        jax.tree.map(jnp.zeros_like, params), tx,
        batch_stats={"m": jnp.full((3,), -1.0)})
    restored = restore_train_state(fresh, path)
    assert int(restored.step) == 2
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 jax.device_get(state.params), jax.device_get(restored.params))
    np.testing.assert_array_equal(np.asarray(restored.batch_stats["m"]),
                                  np.asarray(state.batch_stats["m"]))
    # optimizer momenta restored too: next step must match exactly
    s1 = state.apply_gradients(grads)
    s2 = restored.apply_gradients(grads)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-7),
        jax.device_get(s1.params), jax.device_get(s2.params))


def test_cross_attention_parity():
    torch.manual_seed(4)
    oracle = CrossAttentionOracle(query_dim=512, key_dim=8,
                                  embed_dim=256, num_heads=8).eval()
    state = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = flax_params_from_torch_state(state)

    rng = np.random.default_rng(4)
    query = rng.normal(size=(2, 512)).astype(np.float32)
    kv = rng.normal(size=(2, 64, 8)).astype(np.float32)
    with torch.no_grad():
        out_t = oracle(torch.from_numpy(query), torch.from_numpy(kv)).numpy()

    model = CrossAttention(embed_dim=256, num_heads=8)
    out_j = jax.jit(lambda p, q, kv: model.apply({"params": p}, q, kv))(
        params, jnp.asarray(query), jnp.asarray(kv))
    np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=1e-4, atol=1e-5)


def test_attention_decoder_with_cross_attention_runs():
    """The full decoder with the cross-attention branch enabled."""
    from vae_tagger_tpu.models.taggers import AttentionClassificationDecoder

    model = AttentionClassificationDecoder(
        latent_channels=16, num_classes=5,
        attention=AttentionDecoderConfig(use_cross_attention=True))
    z = jnp.zeros((2, 8, 8, 16))
    variables = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.key(0)}, z, deterministic=True)
    logits = jax.jit(
        lambda v, z: model.apply(v, z, deterministic=True))(variables, z)
    assert logits.shape == (2, 5)
    assert "cross_attention" in variables["params"]
    assert "query_generator" in variables["params"]

def test_partial_vae_checkpoint_reports_and_merges(tmp_path, capsys):
    """A truncated safetensors file must load with key-diff reporting and
    fresh init for the missing keys (the reference's strict=False contract),
    not fail deep inside apply."""
    from vae_tagger_tpu.infer.engine import load_vae_bundle
    from safetensors.numpy import save_file
    from vae_tagger_tpu.io.safetensors_io import torch_state_from_flax_params

    cfg = default_flux_vae_config(block_out_channels=(8, 8, 8, 8),
                                  norm_num_groups=4, latent_channels=4)
    from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL

    model = AutoencoderKL(cfg)
    params = jax.jit(model.init)({"params": jax.random.key(0)},
                                 jnp.zeros((1, 16, 16, 3)),
                                 jax.random.key(1))["params"]
    state = torch_state_from_flax_params(params)
    # drop the decoder half entirely (like a partially-downloaded file)
    truncated = {k: np.ascontiguousarray(v) for k, v in state.items()
                 if not k.startswith("decoder.")}
    path = str(tmp_path / "partial.safetensors")
    save_file(truncated, path)

    cfg_path = str(tmp_path / "config.json")
    import json as _json
    with open(cfg_path, "w") as f:
        _json.dump(cfg.to_json_dict(), f)

    model2, merged = load_vae_bundle(vae_checkpoint=path,
                                     vae_config_path=cfg_path)
    out = capsys.readouterr().out
    assert "missing keys" in out
    assert "decoder" in out
    # encoder weights came from the file; decoder keys freshly initialized
    np.testing.assert_array_equal(merged["encoder"]["conv_in"]["kernel"],
                                  params["encoder"]["conv_in"]["kernel"])
    assert "conv_in" in merged["decoder"]


def test_sd_era_config_json_gets_diffusers_defaults():
    """A real SD-era config JSON omits the quant-conv flags and shift_factor
    (they postdate it); diffusers fills them from the AutoencoderKL
    constructor defaults, and the reference inherits that via
    AutoencoderKL(**config).  vae_config_from_dict must match."""
    from vae_tagger_tpu.core.config import vae_config_from_dict

    sd_json = {  # sd-vae-ft-mse's key set
        "_class_name": "AutoencoderKL",
        "act_fn": "silu",
        "block_out_channels": [128, 256, 512, 512],
        "down_block_types": ["DownEncoderBlock2D"] * 4,
        "in_channels": 3,
        "latent_channels": 4,
        "layers_per_block": 2,
        "norm_num_groups": 32,
        "out_channels": 3,
        "sample_size": 256,
        "scaling_factor": 0.18215,
        "up_block_types": ["UpDecoderBlock2D"] * 4,
    }
    cfg = vae_config_from_dict(sd_json)
    assert cfg.use_quant_conv and cfg.use_post_quant_conv
    assert cfg.latent_channels == 4
    assert cfg.scaling_factor == 0.18215
    assert cfg.shift_factor == 0.0
    # null behaves like absent (diffusers' shift_factor=None == no shift)
    cfg2 = vae_config_from_dict(dict(sd_json, shift_factor=None))
    assert cfg2.shift_factor == 0.0
    # the FLUX config JSON sets all four keys explicitly and is unaffected
    flux = default_flux_vae_config()
    from vae_tagger_tpu.core.config import vae_config_from_dict as fd
    assert fd(flux.to_json_dict()) == flux


def test_quant_conv_vae_round_trips_through_diffusers_layout(tmp_path):
    """SD-family VAE (quant convs on): params export to the diffusers
    safetensors layout (quant_conv.* / post_quant_conv.* keys) and reload
    to identical latents."""
    from vae_tagger_tpu.core.config import default_sd_vae_config
    from vae_tagger_tpu.io.safetensors_io import (
        load_vae_pretrained_dir,
        save_vae_pretrained,
        torch_state_from_flax_params,
    )
    from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL

    cfg = default_sd_vae_config(block_out_channels=(8, 16, 16, 16),
                                norm_num_groups=4, sample_size=32)
    model = AutoencoderKL(cfg)
    params = jax.jit(model.init)({"params": jax.random.key(0)},
                                 jnp.zeros((1, 32, 32, 3)),
                                 jax.random.key(1))["params"]
    assert "quant_conv" in params and "post_quant_conv" in params
    state = torch_state_from_flax_params(params)
    assert "quant_conv.weight" in state  # diffusers key layout
    assert state["quant_conv.weight"].shape == (8, 8, 1, 1)  # OIHW 1x1

    save_vae_pretrained(params, cfg, str(tmp_path / "vae"))
    cfg2, params2 = load_vae_pretrained_dir(str(tmp_path / "vae"))
    assert cfg2.use_quant_conv and cfg2.latent_channels == 4

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 32, 32, 3)).astype(np.float32))
    enc = jax.jit(lambda p, x: model.apply(
        {"params": p}, x, method=AutoencoderKL.encode).mean)
    np.testing.assert_array_equal(np.asarray(enc(params, x)),
                                  np.asarray(enc(params2, x)))


def test_flux_checkpoint_with_quant_config_warns_loudly(tmp_path, capsys):
    """A trimmed config JSON omitting the quant flags defaults them TRUE
    (diffusers semantics); loading a FLUX-family checkpoint (no quant_conv
    weights) then silently runs random quant convs -- the load must warn
    loudly and name the fix."""
    from vae_tagger_tpu.core.config import default_sd_vae_config
    from vae_tagger_tpu.infer.engine import load_vae_bundle
    from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL
    import json as _json

    flux_like = default_flux_vae_config(block_out_channels=(8, 8, 8, 8),
                                        norm_num_groups=4, latent_channels=4)
    model = AutoencoderKL(flux_like)
    params = jax.jit(model.init)({"params": jax.random.key(0)},
                                 jnp.zeros((1, 16, 16, 3)),
                                 jax.random.key(1))["params"]
    save_vae_pretrained(params, flux_like, str(tmp_path / "vae"))

    # a config requesting quant convs the checkpoint does not have
    quant_cfg = default_sd_vae_config(block_out_channels=(8, 8, 8, 8),
                                      norm_num_groups=4, latent_channels=4)
    cfg_path = str(tmp_path / "quant_config.json")
    with open(cfg_path, "w") as f:
        _json.dump(quant_cfg.to_json_dict(), f)
    load_vae_bundle(
        vae_checkpoint=f"{tmp_path}/vae/diffusion_pytorch_model.safetensors",
        vae_config_path=cfg_path)
    out = capsys.readouterr().out
    assert "WARNING" in out and "quant_conv" in out and "FLUX" in out
