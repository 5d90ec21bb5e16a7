"""Latent extraction: images -> flattened latent vectors JSON.

Byte-compatible with the reference's ``latent_vectors.json``
(infer_vae.py:48-81): {image_path: [flat latent floats]}, flattened in the
reference's NCHW (channel-major) order so vectors interchange exactly.
Batched on device instead of per-image.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from ..data.paths import get_image_paths
from ..utils.pipelining import OneInFlight
from ..utils.profiling import ThroughputMeter
from .engine import TaggerEngine, load_vae_bundle
from .pipeline import iter_image_batches, pad_tail_rows


def flatten_latent_torch_order(latent_nhwc: np.ndarray) -> np.ndarray:
    """(h, w, C) -> flat (C*h*w,) channel-major (torch NCHW flatten order)."""
    return np.transpose(latent_nhwc, (2, 0, 1)).reshape(-1)


def infer_and_save_latents(engine, image_path: str,
                           output_dir: str = "inference_output",
                           resolution: int = 1024,
                           batch_size: int = 8,
                           verbose: bool = True,
                           num_workers: int = 4,
                           prefetch_factor: int = 2,
                           output_format: str = "json",
                           transfer_format: str = "rgb") -> dict:
    """``engine`` needs only ``.encode`` (a TaggerEngine or a VAE-only shim).

    Decode overlaps device compute one batch ahead (see pipeline.py).

    output_format: "json" (reference byte-compat ``latent_vectors.json``,
    infer_vae.py:76-81 — ~10 bytes/float, minutes of tolist+dump at scale)
    or "npz" (TPU extension: ``latent_vectors.npz``, one fp32 array per
    image path, ~40x smaller and loadable with ``np.load``).

    transfer_format "yuv420" ships planar 4:2:0 to the device (1.5 B/px,
    half of RGB; chroma upsample + BT.601 conversion fused ahead of the
    encoder) — the same wire-format win infer_full has, relevant because
    this path, like tagging, is host-decode/transfer bound e2e."""
    if output_format not in ("json", "npz"):
        raise ValueError(f"unknown output_format {output_format!r}")
    image_paths = get_image_paths(image_path)
    if not image_paths:
        print("no image files found; check the path")
        return {}

    latent_data = {}
    processed, errors = 0, 0
    meter = ThroughputMeter()
    # one batch in flight: the per-batch host work here (flatten + tolist of
    # ~2M floats at 1024px batch 8) is substantial, so serialize it against
    # the PREVIOUS dispatch and let the device run ahead
    encode_async = getattr(engine, "encode_async",
                           lambda px: (engine.encode(px), len(px)))
    if transfer_format == "yuv420":
        encode_async = engine.encode_yuv_async  # planar (Y, CbCr) pair in

    def resolve(batch_paths, latents_dev, n):
        nonlocal processed
        latents = np.asarray(latents_dev)[:n]
        for path, z in zip(batch_paths, latents):
            flat = flatten_latent_torch_order(np.asarray(z, np.float32))
            latent_data[path] = (flat.tolist() if output_format == "json"
                                 else flat)
        processed += n
        meter.update(n)

    pipeline = OneInFlight(resolve)
    for evt in iter_image_batches(image_paths, resolution, batch_size,
                                  num_workers, prefetch_factor,
                                  pixel_format=transfer_format):
        if evt[0] == "error":
            errors += 1
            print(f"skipping image {evt[1]}: {evt[2]}")
            continue
        _, batch_paths, block = evt
        n = len(batch_paths)
        block = pad_tail_rows(block, batch_size)  # keep the compiled shape
        if transfer_format == "yuv420":
            latents_dev, _ = encode_async(*block)
        else:
            latents_dev, _ = encode_async(block)
        pipeline.submit(batch_paths, latents_dev, n)
    pipeline.flush()

    if verbose:
        print(f"done — ok: {processed}, failed: {errors}, "
              f"total: {len(image_paths)}, {meter.report()}")

    if output_format == "npz":
        output_path = Path(output_dir) / "latent_vectors.npz"
        output_path.parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(output_path, **latent_data)
    else:
        output_path = Path(output_dir) / "latent_vectors.json"
        output_path.parent.mkdir(parents=True, exist_ok=True)
        with open(output_path, "w", encoding="utf-8") as f:
            json.dump(latent_data, f, indent=4)
    if verbose:
        print(f"latent vectors saved to: {output_path}")
    return latent_data


def infer_and_save_latents_tiled(vae, vae_params, image_path: str,
                                 output_dir: str = "inference_output",
                                 tile: int = 1024, overlap: int = 256,
                                 output_format: str = "json",
                                 verbose: bool = True) -> dict:
    """Native-resolution latent extraction via tiled encode (TPU extension).

    The reference (and our standard path above) square-resizes every image
    to ``--resolution`` before encoding (/root/reference/infer_vae.py:48-60)
    — latents of a 4000x6000 photo describe a 1024px thumbnail.  This path
    keeps each image at its native size and encodes through fixed-shape
    overlapping tiles (infer/tiled.py), so latent grids scale with the
    image while HBM stays bounded by one tile batch.  Output schema matches
    ``latent_vectors.json`` (flat channel-major lists; lengths now vary per
    image)."""
    from PIL import Image

    from .tiled import TiledVAE

    if output_format not in ("json", "npz"):
        raise ValueError(f"unknown output_format {output_format!r}")
    image_paths = get_image_paths(image_path)
    if not image_paths:
        print("no image files found; check the path")
        return {}

    tiler = TiledVAE(vae, vae_params, tile=tile, overlap=overlap)
    latent_data, errors = {}, 0
    meter = ThroughputMeter()
    for path in image_paths:
        try:
            img = np.asarray(Image.open(path).convert("RGB"), np.uint8)
            z = tiler.encode(img)
        except Exception as e:
            errors += 1
            print(f"skipping image {path}: {e}")
            continue
        flat = flatten_latent_torch_order(np.asarray(z, np.float32))
        latent_data[str(path)] = (flat.tolist() if output_format == "json"
                                  else flat)
        meter.update(1)
        if verbose:
            print(f"{path}: {img.shape[1]}x{img.shape[0]} -> latent "
                  f"{z.shape[1]}x{z.shape[0]}x{z.shape[2]}")
    if verbose:
        print(f"done — ok: {len(latent_data)}, failed: {errors}, "
              f"{meter.report()}")

    output_path = Path(output_dir) / (
        "latent_vectors.npz" if output_format == "npz"
        else "latent_vectors.json")
    output_path.parent.mkdir(parents=True, exist_ok=True)
    if output_format == "npz":
        np.savez_compressed(output_path, **latent_data)
    else:
        with open(output_path, "w", encoding="utf-8") as f:
            json.dump(latent_data, f, indent=4)
    if verbose:
        print(f"latent vectors saved to: {output_path}")
    return latent_data


class VAEOnlyEngine:
    """Encode-only engine for infer_vae (no decoder checkpoint needed)."""

    def __init__(self, vae_checkpoint=None, vae_config_path=None,
                 mixed_precision=None):
        import jax
        import jax.numpy as jnp

        from ..core.precision import resolve_mixed_precision
        from ..models.autoencoder_kl import AutoencoderKL, encode_scaled
        from ..ops.image import normalize_uint8, yuv420_to_normalized_rgb

        policy = resolve_mixed_precision(mixed_precision)
        self.vae, self.vae_params = load_vae_bundle(
            vae_checkpoint, vae_config_path, policy=policy,
            require_checkpoint=True)

        vae = self.vae

        @jax.jit
        def encode_fn(params, pixels_uint8):
            x = normalize_uint8(pixels_uint8, policy.compute_dtype)
            posterior = vae.apply({"params": params}, x,
                                  method=AutoencoderKL.encode)
            return encode_scaled(posterior.mode(), vae.config)

        @jax.jit
        def encode_yuv_fn(params, y_uint8, cbcr_uint8):
            x = yuv420_to_normalized_rgb(y_uint8, cbcr_uint8,
                                         policy.compute_dtype)
            posterior = vae.apply({"params": params}, x,
                                  method=AutoencoderKL.encode)
            return encode_scaled(posterior.mode(), vae.config)

        self._encode_fn = encode_fn
        self._encode_yuv_fn = encode_yuv_fn

    def encode_async(self, pixels_uint8):
        """Dispatch without fetching: (device_latents, real_count)."""
        import jax.numpy as jnp

        from .engine import TaggerEngine

        # sublane padding: tail batches < 8 rows measured ~3x lower
        # per-pixel throughput on v5e (pads sliced off by the caller)
        px, b = TaggerEngine._pad_batch(np.asarray(pixels_uint8))
        return self._encode_fn(self.vae_params, jnp.asarray(px)), b

    def encode_yuv_async(self, y_uint8, cbcr_uint8):
        """Planar YUV 4:2:0 analogue: (device_latents, real_count)."""
        import jax.numpy as jnp

        from .engine import TaggerEngine

        y, b = TaggerEngine._pad_batch(np.asarray(y_uint8))
        cbcr, _ = TaggerEngine._pad_batch(np.asarray(cbcr_uint8))
        return self._encode_yuv_fn(self.vae_params, jnp.asarray(y),
                                   jnp.asarray(cbcr)), b

    def encode(self, pixels_uint8):
        latents, b = self.encode_async(pixels_uint8)
        return np.asarray(latents)[:b]
