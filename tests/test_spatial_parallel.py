"""Spatial (latency-mode) partitioned inference over the virtual CPU mesh.

``TaggerEngine.with_spatial_mesh`` shards the image HEIGHT across a mesh
axis so one image's VAE encode is computed by all chips cooperatively
(GSPMD halo exchange for the convs, psum for the GroupNorm reductions,
K/V all-gather in the mid-block attention) — the latency complement to the
throughput-mode ``with_mesh`` data parallelism.  The reference has no
equivalent: Accelerate DDP cannot split a single image
(/root/reference/infer_full.py:94-105 runs batch-1 on one device).

These tests assert numerics against the single-device engine on the
8-virtual-device CPU mesh, for both a pure latency mesh ('model',) and a
2-D throughput x latency mesh ('data', 'model').
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_tagger_tpu.core.config import default_flux_vae_config
from vae_tagger_tpu.infer import TaggerEngine
from vae_tagger_tpu.infer.engine import build_decoder
from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL
from vae_tagger_tpu.parallel.mesh import make_mesh

# 64px so the latent grid (64/8 = 8 rows) splits evenly 8 ways at the
# pixel level: H % (downsample * shards) == 64 % 64 == 0
CFG = default_flux_vae_config(block_out_channels=(8, 16, 16, 16),
                              norm_num_groups=4, latent_channels=16,
                              sample_size=64)


@pytest.fixture(scope="module")
def engine():
    model = AutoencoderKL(CFG)
    params = jax.jit(model.init)({"params": jax.random.key(0)},
                                 jnp.zeros((1, 64, 64, 3)),
                                 jax.random.key(1))["params"]
    decoder = build_decoder(5, use_attention=True, latent_channels=16)
    variables = jax.jit(decoder.init, static_argnames=("deterministic",))(
        {"params": jax.random.key(2)}, jnp.zeros((1, 8, 8, 16)),
        deterministic=True)
    return TaggerEngine(vae=model, vae_params=params, decoder=decoder,
                        decoder_variables=dict(variables),
                        tag_names=[f"t{i}" for i in range(5)])


@pytest.fixture(scope="module")
def spatial(engine):
    assert jax.device_count() >= 8, "conftest pins 8 virtual CPU devices"
    return engine.with_spatial_mesh(make_mesh(("model",)))


@pytest.fixture(scope="module")
def grid(engine):
    mesh = make_mesh(("data", "model"), shape=(2, 4))
    return engine.with_spatial_mesh(mesh)


def test_spatial_classify_matches_single_device(engine, spatial, rng):
    px = rng.integers(0, 256, (3, 64, 64, 3), dtype=np.uint8)
    ref = engine.classify(px)
    out = spatial.classify(px)
    assert out.shape == ref.shape == (3, 5)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_spatial_encode_matches_single_device(engine, spatial, rng):
    px = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    ref = engine.encode(px)
    out = spatial.encode(px)
    assert out.shape == ref.shape == (2, 8, 8, 16)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_spatial_does_not_pad_the_batch(spatial, rng):
    # latency mode must not round a lone image up to 8 sublane rows — that
    # would multiply its latency by 8, the opposite of the mode's point
    assert spatial.pad_multiple() == 1
    px = rng.integers(0, 256, (1, 64, 64, 3), dtype=np.uint8)
    placed = spatial._place(px)
    assert placed.shape[0] == 1
    # the single image IS spread over every device (H sharded)
    assert len(placed.sharding.device_set) == jax.device_count()


def test_grid_mesh_classify_matches_single_device(engine, grid, rng):
    # 2-D mesh: batch over 'data' (2), height over 'model' (4)
    px = rng.integers(0, 256, (4, 64, 64, 3), dtype=np.uint8)
    ref = engine.classify(px)
    out = grid.classify(px)
    np.testing.assert_allclose(out, ref, atol=1e-5)
    assert grid.pad_multiple() == 2  # batch pads to the data-axis extent


def test_grid_mesh_pads_odd_batch_on_data_axis(engine, grid, rng):
    px = rng.integers(0, 256, (3, 64, 64, 3), dtype=np.uint8)
    ref = engine.classify(px)
    out = grid.classify(px)  # padded to 4 internally, pad row dropped
    assert out.shape == ref.shape == (3, 5)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_indivisible_height_is_rejected(spatial, rng):
    # 32px over 8 shards would leave the latent grid (4 rows) under-split;
    # a clear error beats silent GSPMD padding with unpredictable perf
    px = rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="divisible"):
        spatial.classify(px)


def test_missing_axis_is_rejected(engine):
    with pytest.raises(ValueError, match="no axis"):
        engine.with_spatial_mesh(make_mesh(("data",)))
