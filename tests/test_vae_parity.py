"""Numerical parity: Flax VAE vs independent torch oracle.

This is the BASELINE.json gate in miniature: identical weights loaded through
the checkpoint mapper must produce identical latents (MSE < 1e-4; in practice
we assert much tighter) and identical reconstructions.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vae_tagger_tpu.core.config import default_flux_vae_config
from vae_tagger_tpu.io.safetensors_io import (
    flax_params_from_torch_state,
    torch_state_from_flax_params,
)
from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL, DiagonalGaussian

from torch_oracle.vae_torch import AutoencoderKLOracle

CFG = dict(block_out_channels=(8, 16, 16, 16), norm_num_groups=4,
           latent_channels=4)


@functools.lru_cache(maxsize=None)
def _pair():
    torch.manual_seed(0)
    oracle = AutoencoderKLOracle(
        block_out_channels=CFG["block_out_channels"],
        norm_num_groups=CFG["norm_num_groups"],
        latent_channels=CFG["latent_channels"],
    ).eval()
    state = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    flax_params = flax_params_from_torch_state(state)
    model = AutoencoderKL(default_flux_vae_config(**CFG))
    return oracle, model, flax_params


def test_encoder_parity():
    oracle, model, params = _pair()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        moments_t = oracle.encode_moments(
            torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    mean_t = moments_t[:, : CFG["latent_channels"]].transpose(0, 2, 3, 1)
    logvar_t = moments_t[:, CFG["latent_channels"]:].transpose(0, 2, 3, 1)

    posterior = jax.jit(
        lambda p, x: model.apply({"params": p}, x, method=AutoencoderKL.encode)
    )(params, jnp.asarray(x))

    mse = float(np.mean((np.asarray(posterior.mean) - mean_t) ** 2))
    assert mse < 1e-10, mse
    np.testing.assert_allclose(np.asarray(posterior.mean), mean_t,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(posterior.logvar),
        np.clip(logvar_t, -30, 20), rtol=1e-4, atol=1e-5)


def test_decoder_parity():
    oracle, model, params = _pair()
    rng = np.random.default_rng(1)
    z = rng.normal(size=(1, 4, 4, CFG["latent_channels"])).astype(np.float32)

    with torch.no_grad():
        recon_t = oracle.decode(
            torch.from_numpy(z).permute(0, 3, 1, 2)).numpy().transpose(0, 2, 3, 1)

    recon_j = jax.jit(
        lambda p, z: model.apply({"params": p}, z, method=AutoencoderKL.decode)
    )(params, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(recon_j), recon_t,
                               rtol=1e-4, atol=1e-5)


def test_state_dict_roundtrip():
    """flax -> torch-layout -> flax is the identity (export path check)."""
    oracle, model, params = _pair()
    state = torch_state_from_flax_params(params)
    # keys must exactly match the torch oracle's state_dict
    assert set(state) == set(oracle.state_dict().keys())
    params2 = flax_params_from_torch_state(state)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 params, params2)


def test_sd_family_quant_conv_parity():
    """SD-style VAE (4-ch latents, 1x1 quant convs on both sides — the
    family the reference inherits through diffusers AutoencoderKL): oracle
    weights loaded through the checkpoint mapper must produce identical
    moments and reconstructions, with the quant convs actually applied."""
    from vae_tagger_tpu.core.config import default_sd_vae_config

    torch.manual_seed(7)
    oracle = AutoencoderKLOracle(
        block_out_channels=CFG["block_out_channels"],
        norm_num_groups=CFG["norm_num_groups"],
        latent_channels=CFG["latent_channels"],
        use_quant_conv=True, use_post_quant_conv=True,
    ).eval()
    state = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = flax_params_from_torch_state(state)
    assert "quant_conv" in params and "post_quant_conv" in params

    model = AutoencoderKL(default_sd_vae_config(
        block_out_channels=CFG["block_out_channels"],
        norm_num_groups=CFG["norm_num_groups"],
        latent_channels=CFG["latent_channels"]))

    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        moments_t = oracle.encode_moments(
            torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    mean_t = moments_t[:, : CFG["latent_channels"]].transpose(0, 2, 3, 1)

    posterior = jax.jit(
        lambda p, x: model.apply({"params": p}, x, method=AutoencoderKL.encode)
    )(params, jnp.asarray(x))
    mse = float(np.mean((np.asarray(posterior.mean) - mean_t) ** 2))
    assert mse < 1e-10, mse

    z = rng.normal(size=(1, 4, 4, CFG["latent_channels"])).astype(np.float32)
    with torch.no_grad():
        recon_t = oracle.decode(torch.from_numpy(z).permute(
            0, 3, 1, 2)).numpy().transpose(0, 2, 3, 1)
    recon_j = jax.jit(
        lambda p, z: model.apply({"params": p}, z, method=AutoencoderKL.decode)
    )(params, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(recon_j), recon_t,
                               rtol=1e-4, atol=1e-5)

    # the quant convs must MATTER: dropping them changes the moments
    flux_like = AutoencoderKL(default_sd_vae_config(
        block_out_channels=CFG["block_out_channels"],
        norm_num_groups=CFG["norm_num_groups"],
        latent_channels=CFG["latent_channels"],
        use_quant_conv=False, use_post_quant_conv=False))
    bare = {k: v for k, v in params.items()
            if k not in ("quant_conv", "post_quant_conv")}
    bare_mean = jax.jit(
        lambda p, x: flux_like.apply({"params": p}, x,
                                     method=AutoencoderKL.encode).mean
    )(bare, jnp.asarray(x))
    assert float(np.mean((np.asarray(bare_mean) - mean_t) ** 2)) > 1e-6
