"""AutoencoderKL structural and numerical tests."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_tagger_tpu.core.config import default_flux_vae_config
from vae_tagger_tpu.models.autoencoder_kl import (
    AutoencoderKL,
    DiagonalGaussian,
    decode_scaled,
    encode_scaled,
)

TINY = default_flux_vae_config(block_out_channels=(8, 16, 16, 16),
                               norm_num_groups=4, latent_channels=4)


@functools.lru_cache(maxsize=None)
def _tiny_params():
    model = AutoencoderKL(TINY)
    x = jnp.zeros((1, 32, 32, 3))
    # always jit init: eager per-op dispatch is pathologically slow on this host
    return jax.jit(model.init)({"params": jax.random.key(0)}, x,
                               jax.random.key(1))


@pytest.fixture(scope="module")
def tiny():
    model = AutoencoderKL(TINY)
    return model, _tiny_params()


def test_encoder_shapes(tiny):
    model, variables = tiny
    x = jnp.zeros((2, 32, 32, 3))
    posterior = jax.jit(
        lambda v, x: model.apply(v, x, method=AutoencoderKL.encode)
    )(variables, x)
    assert posterior.mean.shape == (2, 4, 4, 4)
    assert posterior.logvar.shape == (2, 4, 4, 4)


def test_roundtrip_shapes(tiny):
    model, variables = tiny
    x = jnp.zeros((1, 32, 32, 3))
    recon, posterior = jax.jit(model.apply)(variables, x, jax.random.key(2))
    assert recon.shape == x.shape
    assert posterior.mean.shape == (1, 4, 4, 4)


def test_full_flux_config_latent_geometry():
    """FLUX config: 8x downsample, 16 latent channels (modules.py:244-254),
    ~83.8M parameters — all checked abstractly (no compute)."""
    cfg = default_flux_vae_config()
    model = AutoencoderKL(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    params = jax.eval_shape(
        lambda: model.init({"params": jax.random.key(0)}, x,
                           jax.random.key(1))["params"])
    posterior = jax.eval_shape(
        functools.partial(model.apply, method=AutoencoderKL.encode),
        {"params": params}, x)
    assert posterior.mean.shape == (1, 8, 8, 16)
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    assert 80e6 < n_params < 90e6, n_params


def test_diagonal_gaussian_kl_analytic():
    """kl() must equal the closed form 0.5*sum(mu^2 + var - 1 - logvar)
    (diffusers semantics; cf. the reference's MockPosterior oracle,
    improved_losses.py:354-359)."""
    rng = np.random.default_rng(0)
    mean = rng.normal(size=(3, 4, 4, 2)).astype(np.float32)
    logvar = rng.normal(size=(3, 4, 4, 2)).astype(np.float32)
    g = DiagonalGaussian(mean=jnp.asarray(mean), logvar=jnp.asarray(logvar))
    expected = 0.5 * np.sum(mean**2 + np.exp(logvar) - 1 - logvar, axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(g.kl()), expected, rtol=1e-5)


def test_diagonal_gaussian_logvar_clamp():
    moments = jnp.concatenate(
        [jnp.zeros((1, 2, 2, 1)), jnp.full((1, 2, 2, 1), 100.0)], axis=-1)
    g = DiagonalGaussian.from_moments(moments)
    assert float(jnp.max(g.logvar)) == 20.0


def test_sample_statistics():
    g = DiagonalGaussian(mean=jnp.full((1, 8, 8, 4), 2.0),
                         logvar=jnp.zeros((1, 8, 8, 4)))
    keys = jax.random.split(jax.random.key(0), 64)
    samples = jax.jit(jax.vmap(g.sample))(keys)
    assert abs(float(jnp.mean(samples)) - 2.0) < 0.05
    np.testing.assert_allclose(np.asarray(g.mode()), 2.0)


def test_scale_shift_roundtrip():
    cfg = default_flux_vae_config()
    z = jnp.linspace(-2, 2, 16).reshape(1, 2, 2, 4)
    np.testing.assert_allclose(
        np.asarray(decode_scaled(encode_scaled(z, cfg), cfg)),
        np.asarray(z), rtol=1e-5, atol=1e-6)


def test_param_structure_matches_diffusers_layout(tiny):
    """Spot-check the flax param tree names that the checkpoint mapper relies
    on (diffusers keys like encoder.down_blocks.0.resnets.0.conv1.weight)."""
    _, variables = tiny
    params = variables["params"]
    enc = params["encoder"]
    assert "conv_in" in enc
    assert "resnets_0" in enc["down_blocks_0"]
    assert "conv1" in enc["down_blocks_0"]["resnets_0"]
    assert "downsamplers_0" in enc["down_blocks_0"]
    assert "downsamplers_0" not in enc["down_blocks_3"]
    assert "attentions_0" in enc["mid_block"]
    assert "to_q" in enc["mid_block"]["attentions_0"]
    dec = params["decoder"]
    assert "upsamplers_0" in dec["up_blocks_0"]
    assert "upsamplers_0" not in dec["up_blocks_3"]
    # shortcut conv only where channels change (8 -> 16 at down block 1)
    assert "conv_shortcut" in enc["down_blocks_1"]["resnets_0"]
    assert "conv_shortcut" not in enc["down_blocks_1"]["resnets_1"]


def test_remat_matches_and_differentiates():
    """remat=True must produce identical outputs and gradients."""
    model = AutoencoderKL(TINY)
    model_r = AutoencoderKL(TINY, remat=True)
    variables = _tiny_params()
    x = jnp.ones((1, 32, 32, 3)) * 0.3

    def loss(m):
        def f(p):
            post = m.apply({"params": p}, x, method=AutoencoderKL.encode)
            return jnp.sum(post.mean ** 2)
        return f

    v1, g1 = jax.jit(jax.value_and_grad(loss(model)))(variables["params"])
    v2, g2 = jax.jit(jax.value_and_grad(loss(model_r)))(variables["params"])
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    # gradients agree up to fp reassociation noise from the recompute
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4), g1, g2)
