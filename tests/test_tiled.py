"""Tiled VAE encode/decode tests (infer/tiled.py).

The blend machinery is pinned EXACTLY with shift-invariant stand-ins
(average-pool "encoder", nearest-upsample "decoder": receptive field
fits any overlap, so tiled must equal direct bit-for-bit); the real-VAE
behavior (per-tile GroupNorm stats) is pinned with tolerance on smooth
content plus shape/validation contracts.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from vae_tagger_tpu.infer.tiled import (  # noqa: E402
    TiledVAE,
    tile_starts,
    tiled_apply,
)


def _pool8(t):
    """(B, H, W, C) -> 8x8 average pool, the shift-invariant encode stand-in
    (aligned to the global grid because tile/overlap are multiples of 8)."""
    b, h, w, c = t.shape
    return np.asarray(t, np.float32).reshape(
        b, h // 8, 8, w // 8, 8, c).mean((2, 4))


def _up8(t):
    """(B, h, w, C) -> nearest 8x upsample, the decode stand-in."""
    return np.repeat(np.repeat(np.asarray(t, np.float32), 8, 1), 8, 2)


def test_tile_starts_cover_and_clamp():
    assert tile_starts(80, 48, 32) == [0, 32]
    assert tile_starts(120, 48, 32) == [0, 32, 64, 72]  # last clamped
    assert tile_starts(48, 48, 32) == [0]
    assert tile_starts(40, 48, 32) == [0]  # smaller than tile
    for size, tile, stride in ((80, 48, 32), (120, 48, 32), (1000, 128, 96)):
        starts = tile_starts(size, tile, stride)
        assert starts[-1] + tile == size or size <= tile
        # complete coverage, no gaps
        end = 0
        for s in starts:
            assert s <= end
            end = max(end, s + tile)
        assert end >= size


def test_tiled_apply_exact_for_shift_invariant_op():
    """Average pool has an 8px receptive field aligned to the tile grid, so
    overlapping tiles compute IDENTICAL outputs where they overlap and the
    partition-of-unity blend must reproduce the direct result exactly —
    including the clamped (irregular-overlap) last column of tiles."""
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (80, 120, 3)).astype(np.float32)
    direct = _pool8(x[None])[0]
    tiled = tiled_apply(x, tile=48, overlap=16, out_scale=1 / 8,
                        out_channels=3, apply_chunk=_pool8, batch_tiles=4)
    np.testing.assert_allclose(tiled, direct, rtol=0, atol=1e-3)

    up_direct = _up8(direct[None])[0]
    up_tiled = tiled_apply(direct, tile=6, overlap=2, out_scale=8,
                           out_channels=3, apply_chunk=_up8, batch_tiles=4)
    np.testing.assert_allclose(up_tiled, up_direct, rtol=0, atol=1e-3)


def test_tiled_apply_validations():
    x = np.zeros((32, 32, 3), np.float32)
    with pytest.raises(ValueError):
        tiled_apply(x, tile=16, overlap=16, out_scale=1, out_channels=3,
                    apply_chunk=lambda t: t)
    with pytest.raises(ValueError):  # smaller than tile: caller pads
        tiled_apply(x, tile=64, overlap=8, out_scale=1, out_channels=3,
                    apply_chunk=lambda t: t)


def _smooth(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([128 + 90 * np.sin(xx / 37.0) * np.cos(yy / 29.0),
                    128 + 70 * np.cos(xx / 53.0),
                    128 + 60 * np.sin((xx + yy) / 41.0)], axis=-1)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def tiny_vae():
    from vae_tagger_tpu.core.config import default_flux_vae_config
    from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL

    cfg = default_flux_vae_config(block_out_channels=(8, 16, 16, 16),
                                  norm_num_groups=4, latent_channels=16,
                                  sample_size=64)
    vae = AutoencoderKL(cfg)
    params = jax.jit(vae.init)({"params": jax.random.key(0)},
                               jnp.zeros((1, 64, 64, 3)),
                               jax.random.key(1))["params"]
    return vae, params


def _direct_encode(vae, params):
    from vae_tagger_tpu.models.autoencoder_kl import (
        AutoencoderKL,
        encode_scaled,
    )
    from vae_tagger_tpu.ops.image import normalize_uint8

    @jax.jit
    def direct(px):
        posterior = vae.apply({"params": params},
                              normalize_uint8(px[None]),
                              method=AutoencoderKL.encode)
        return encode_scaled(posterior.mode(), vae.config)[0]

    return lambda img: np.asarray(direct(jnp.asarray(img)))


def test_tiled_vae_single_tile_equals_direct(tiny_vae):
    """An image that fits one tile must round through the tiling machinery
    (grid, chunk batching, blend, crop) bit-compatibly with a direct pass —
    blending with one tile is a multiply-divide by 1."""
    vae, params = tiny_vae
    img = _smooth(64, 64)
    z_direct = _direct_encode(vae, params)(img)
    tv = TiledVAE(vae, params, tile=64, overlap=16, batch_tiles=4)
    z_tiled = tv.encode(img)
    assert z_tiled.shape == z_direct.shape == (8, 8, 16)
    np.testing.assert_allclose(z_tiled, z_direct, rtol=1e-5, atol=1e-6)


def test_tiled_vae_multi_tile_bounded_error(tiny_vae):
    """Multi-tile encode is approximate by design (tile borders zero-pad
    inside the convs and GroupNorm stats are per-tile — the same
    approximation diffusers' enable_tiling makes).  On this tiny 4-stage
    VAE the receptive field dwarfs a 64px tile, the worst case for the
    approximation; pin that the output stays on the direct pass's scale
    and the error stays bounded (a blend-machinery bug — wrong weights,
    misplaced tiles — blows these up immediately, measured ~20x)."""
    vae, params = tiny_vae
    img = np.full((96, 128, 3), 137, np.uint8)
    z_direct = _direct_encode(vae, params)(img)
    tv = TiledVAE(vae, params, tile=64, overlap=32, batch_tiles=4)
    z_tiled = tv.encode(img)
    assert z_tiled.shape == z_direct.shape == (12, 16, 16)
    assert np.isfinite(z_tiled).all()
    err = np.abs(z_tiled - z_direct)
    scale = z_direct.std()
    assert err.mean() < 0.6 * scale, (err.mean(), scale)
    assert err.max() < 3.0 * scale, (err.max(), scale)


def test_tiled_vae_roundtrip_and_odd_sizes(tiny_vae):
    """Non-multiple-of-8 and smaller-than-tile inputs pad internally and
    crop back; decode inverts the latent grid to full pixels."""
    vae, params = tiny_vae
    tv = TiledVAE(vae, params, tile=64, overlap=16, batch_tiles=4)
    img = _smooth(70, 50, seed=2)  # odd dims, smaller than one tile
    z = tv.encode(img)
    assert z.shape == (9, 7, 16)  # ceil(70/8), ceil(50/8)
    px = tv.decode(z)
    assert px.shape == (72, 56, 3)
    assert np.isfinite(px).all()

    with pytest.raises(ValueError):
        TiledVAE(vae, params, tile=60, overlap=16)  # tile % 8 != 0
