"""Tiled VAE encode/decode for arbitrary-resolution images.

The reference caps every input at a fixed resolution (square resize at
inference, /root/reference/infer_full.py:79; bucketing caps pixels at
max_resolution^2 during training, /root/reference/modules.py:192-195) —
there is no way to extract latents or reconstruct at native size for
images beyond what one forward pass fits.  Tiling runs the VAE over
fixed-shape overlapping tiles and blends the overlaps with a
partition-of-unity trapezoid ramp, so ANY input size runs through ONE
compiled tile program — the TPU answer to diffusers' ``enable_tiling``:
static shapes for XLA, tiles batched 8 at a time onto full sublanes,
bounded HBM no matter the image.

Semantics note (same caveat as diffusers' tiling): GroupNorm statistics
are per-tile instead of global, so outputs near tile interiors differ
slightly from a direct full-image pass; the overlap ramps hide seams.
The blend machinery itself is exact — for any shift-invariant op whose
receptive field fits inside the overlap, tiled == direct bit-for-bit
(tests/test_tiled.py pins this with an average-pool stand-in).
"""

from __future__ import annotations

import math
from typing import Callable, List

import numpy as np


def tile_starts(size: int, tile: int, stride: int) -> List[int]:
    """Static tile origins covering [0, size): uniform stride, with the
    last tile clamped so it ends exactly at ``size`` (every tile keeps the
    same shape -> one compiled program; the clamped tile just overlaps its
    neighbor more, which the weighted blend handles naturally)."""
    if size <= tile:
        return [0]
    n = math.ceil((size - tile) / stride) + 1
    return sorted({min(i * stride, size - tile) for i in range(n)})


def _axis_weights(start: int, tile: int, size: int, ramp: int) -> np.ndarray:
    """Trapezoid blend weights for one tile along one axis: linear ramps of
    ``ramp`` samples at edges that meet a neighboring tile, flat 1 at image
    borders.  Overlapping trapezoids need not sum to 1 — the accumulator
    divides by the summed weights (partition of unity by construction)."""
    w = np.ones(tile, dtype=np.float32)
    r = np.arange(1, ramp + 1, dtype=np.float32) / (ramp + 1)
    if start > 0 and ramp:
        w[:ramp] = r
    if start + tile < size and ramp:
        w[-ramp:] = r[::-1]
    return w


def tiled_apply(x: np.ndarray, tile: int, overlap: int, out_scale: float,
                out_channels: int, apply_chunk: Callable,
                batch_tiles: int = 8) -> np.ndarray:
    """Run ``apply_chunk`` over overlapping tiles of ``x`` and blend.

    Args:
      x: (H, W, C_in) array (uint8 pixels for encode, float latents for
        decode).  H and W must be multiples of the VAE's resolution ratio
        so tile grids align between the two spaces (callers pad).
      tile / overlap: tile extent and neighbor overlap in INPUT samples.
      out_scale: output-grid samples per input sample (1/8 encode, 8 decode).
      out_channels: channels of the output grid.
      apply_chunk: (batch_tiles, tile, tile, C_in) -> (batch_tiles, t_out,
        t_out, out_channels); jitted once, reused for every chunk.
      batch_tiles: tiles per device call (8 = full v5e sublanes).

    Returns (H*out_scale, W*out_scale, out_channels) float32.
    """
    if not 0 <= overlap < tile:
        raise ValueError(f"need 0 <= overlap < tile, got {overlap}/{tile}")
    h, w = x.shape[:2]
    stride = tile - overlap
    rows = tile_starts(h, tile, stride)
    cols = tile_starts(w, tile, stride)
    # a single tile covering the whole axis may be larger than the image —
    # the grid math assumes x is at least one tile; callers pad up front
    if h < tile or w < tile:
        raise ValueError(f"input {h}x{w} smaller than tile {tile}; pad first")

    tiles = np.stack([x[r:r + tile, c:c + tile]
                      for r in rows for c in cols])
    n = len(tiles)
    pad = -n % batch_tiles
    if pad:  # duplicate rows keep the one compiled shape for the tail
        tiles = np.concatenate([tiles, tiles[:1].repeat(pad, 0)])

    outs = []
    for i in range(0, len(tiles), batch_tiles):
        outs.append(np.asarray(apply_chunk(tiles[i:i + batch_tiles]),
                               dtype=np.float32))
    outs = np.concatenate(outs)[:n]

    def s(v: int) -> int:
        o = v * out_scale
        assert o == int(o), (v, out_scale)
        return int(o)

    t_out = s(tile)
    if outs.shape[1:3] != (t_out, t_out):
        raise ValueError(f"apply_chunk returned {outs.shape[1:3]}, "
                         f"expected {(t_out, t_out)}")
    acc = np.zeros((s(h), s(w), out_channels), dtype=np.float32)
    wacc = np.zeros((s(h), s(w), 1), dtype=np.float32)
    k = 0
    for r in rows:
        wr = _axis_weights(s(r), t_out, s(h), s(overlap))
        for c in cols:
            wc = _axis_weights(s(c), t_out, s(w), s(overlap))
            wt = np.outer(wr, wc)[..., None]
            acc[s(r):s(r) + t_out, s(c):s(c) + t_out] += outs[k] * wt
            wacc[s(r):s(r) + t_out, s(c):s(c) + t_out] += wt
            k += 1
    return acc / wacc


def _pad_to(x: np.ndarray, h: int, w: int) -> np.ndarray:
    """Edge-replicate padding (zeros would bleed black into border tiles'
    GroupNorm statistics)."""
    return np.pad(x, ((0, h - x.shape[0]), (0, w - x.shape[1]), (0, 0)),
                  mode="edge")


class TiledVAE:
    """Arbitrary-resolution encode/decode over one compiled tile program.

    ``tile`` is the pixel-space tile size; ``overlap`` the pixel-space
    neighbor overlap.  Both must be multiples of the VAE downsample factor
    (8) so pixel and latent tile grids align; the FLUX encoder's total
    receptive field is a few hundred pixels, so the 256px default overlap
    gives interior outputs effectively full context.
    """

    def __init__(self, vae, vae_params, tile: int = 1024,
                 overlap: int = 256, batch_tiles: int = 8,
                 compute_dtype=None):
        import jax
        import jax.numpy as jnp

        from ..models.autoencoder_kl import AutoencoderKL, encode_scaled
        from ..ops.image import normalize_uint8

        f = vae.config.downsample_factor
        if tile % f or overlap % f:
            raise ValueError(f"tile/overlap must be multiples of the "
                             f"downsample factor {f}; got {tile}/{overlap}")
        self.vae, self.vae_params = vae, vae_params
        self.tile, self.overlap = tile, overlap
        self.batch_tiles = batch_tiles
        self.f = f
        dtype = compute_dtype or vae.dtype

        @jax.jit
        def encode_chunk(params, px_u8):
            x = normalize_uint8(px_u8, dtype)
            posterior = vae.apply({"params": params}, x,
                                  method=AutoencoderKL.encode)
            return encode_scaled(posterior.mode(), vae.config)

        @jax.jit
        def decode_chunk(params, z_scaled):
            from ..models.autoencoder_kl import decode_scaled

            z = decode_scaled(z_scaled.astype(jnp.float32), vae.config)
            return vae.apply({"params": params}, z.astype(dtype),
                             method=AutoencoderKL.decode)

        self._encode_chunk = encode_chunk
        self._decode_chunk = decode_chunk

    def encode(self, pixels_u8: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8 -> (ceil(H/8), ceil(W/8), C) fp32 SCALED latents
        (same scale/shift as ``DiffusersVAEWrapper.encode``)."""
        import jax.numpy as jnp

        h, w = pixels_u8.shape[:2]
        hp = max(self.tile, -(-h // self.f) * self.f)
        wp = max(self.tile, -(-w // self.f) * self.f)
        x = _pad_to(np.asarray(pixels_u8), hp, wp)
        z = tiled_apply(
            x, self.tile, self.overlap, 1 / self.f,
            self.vae.config.latent_channels,
            lambda t: self._encode_chunk(self.vae_params, jnp.asarray(t)),
            self.batch_tiles)
        return z[:-(-h // self.f), :-(-w // self.f)]

    def decode(self, latents: np.ndarray) -> np.ndarray:
        """(h, w, C) scaled latents -> (h*8, w*8, 3) fp32 in [-1, 1]."""
        import jax.numpy as jnp

        h, w = latents.shape[:2]
        tl, ov = self.tile // self.f, self.overlap // self.f
        hp, wp = max(tl, h), max(tl, w)
        z = _pad_to(np.asarray(latents, np.float32), hp, wp)
        px = tiled_apply(
            z, tl, ov, self.f, 3,
            lambda t: self._decode_chunk(self.vae_params, jnp.asarray(t)),
            self.batch_tiles)
        return px[:h * self.f, :w * self.f]
