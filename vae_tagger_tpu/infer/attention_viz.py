"""Attention-map extraction to disk: the visualization the reference's API
promises but stubs out.

``AttentionClassificationDecoder.get_attention_maps`` in the reference
returns ``{}`` with a "would require forward hooks" comment
(``/root/reference/modules.py:477-485``).  Here the modules ``sow`` their
gates/weights (models/taggers.py), the engine exposes them batched
(infer/engine.py::get_attention_maps), and this module turns them into
artifacts a user can open:

- ``<stem>_attention.npz`` — the raw maps per image (fp16: these are
  sigmoid gates / softmax weights, visualization-precision data);
- ``<stem>_spatial.png`` / ``<stem>_mhsa.png`` — heat overlays on the
  model-input image: the CBAM spatial gate, and the MHSA "attention
  received" per latent position (softmax weight column-mass, head-mean);
- ``attention_maps_index.json`` — what was written, with shapes.

Pure numpy + PIL; no plotting dependency.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
from PIL import Image

from ..data.bucketing import load_and_transform_image
from ..data.paths import get_image_paths

# 5-anchor heat LUT (dark violet -> red -> yellow), interpolated to 256
_ANCHORS = np.array([[13, 8, 65], [106, 23, 110], [201, 62, 74],
                     [245, 125, 21], [250, 235, 100]], np.float32)


def _heat_rgb(v: np.ndarray) -> np.ndarray:
    """(H, W) in [0,1] -> (H, W, 3) uint8 heat colors."""
    x = np.clip(v, 0.0, 1.0) * (len(_ANCHORS) - 1)
    i = np.minimum(x.astype(np.int32), len(_ANCHORS) - 2)
    t = (x - i)[..., None]
    return ((1 - t) * _ANCHORS[i] + t * _ANCHORS[i + 1]).astype(np.uint8)


def _overlay(image_u8: np.ndarray, heat01: np.ndarray,
             alpha: float = 0.55) -> Image.Image:
    """Blend a [0,1] heat map (any grid size) over an HWC uint8 image."""
    h, w = image_u8.shape[:2]
    heat = np.asarray(Image.fromarray(
        (np.clip(heat01, 0, 1) * 255).astype(np.uint8)).resize(
            (w, h), Image.BILINEAR), np.float32) / 255.0
    colored = _heat_rgb(heat).astype(np.float32)
    a = (alpha * heat)[..., None]  # weight by intensity: cool stays photo
    out = (1 - a) * image_u8.astype(np.float32) + a * colored
    return Image.fromarray(out.astype(np.uint8))


def _normalize01(m: np.ndarray) -> np.ndarray:
    lo, hi = float(m.min()), float(m.max())
    return (m - lo) / (hi - lo) if hi > lo else np.zeros_like(m)


def dump_attention_maps(engine, image_path: str, output_dir: str,
                        resolution: int = 512, batch_size: int = 8,
                        save_overlays: bool = True,
                        max_images: Optional[int] = None) -> dict:
    """Run every image under ``image_path`` through the tagger head and
    write its attention maps (see module docstring for the artifacts).

    Returns the index dict that is also written to
    ``output_dir/attention_maps_index.json``."""
    paths = get_image_paths(image_path)
    if max_images:
        paths = paths[:max_images]
    if not paths:
        raise FileNotFoundError(f"no images under {image_path}")
    os.makedirs(output_dir, exist_ok=True)

    # discovery is recursive, so basenames can repeat across subdirectories;
    # disambiguate repeats with a counter suffix instead of overwriting
    seen: dict = {}
    stems = []
    for p in paths:
        stem = os.path.splitext(os.path.basename(p))[0]
        n = seen.get(stem, 0)
        seen[stem] = n + 1
        stems.append(stem if n == 0 else f"{stem}__{n}")

    index = {"resolution": resolution, "images": {}}
    for start in range(0, len(paths), batch_size):
        chunk = paths[start:start + batch_size]
        pixels = np.stack([load_and_transform_image(p, resolution=resolution)
                           for p in chunk])
        maps = engine.get_attention_maps(pixels)
        for j, p in enumerate(chunk):
            stem = stems[start + j]
            per_image = {k: np.asarray(v[j], np.float16)
                         for k, v in maps.items()}
            npz_path = os.path.join(output_dir, f"{stem}_attention.npz")
            np.savez_compressed(npz_path, **per_image)
            entry = {"npz": os.path.basename(npz_path),
                     "maps": {k: list(v.shape)
                              for k, v in per_image.items()}}

            if save_overlays and "spatial_attention" in per_image:
                gate = _normalize01(
                    per_image["spatial_attention"][..., 0].astype(np.float32))
                out = os.path.join(output_dir, f"{stem}_spatial.png")
                _overlay(pixels[j], gate).save(out)
                entry["spatial_overlay"] = os.path.basename(out)
            if save_overlays and "self_attention" in per_image:
                # (heads, S, S) -> attention RECEIVED by each position:
                # column mass, head-mean, back onto the sqrt(S) latent grid
                w = per_image["self_attention"].astype(np.float32)
                received = w.mean(axis=0).sum(axis=0)  # (S,)
                side = int(round(len(received) ** 0.5))
                if side * side == len(received):
                    grid = _normalize01(received.reshape(side, side))
                    out = os.path.join(output_dir, f"{stem}_mhsa.png")
                    _overlay(pixels[j], grid).save(out)
                    entry["mhsa_overlay"] = os.path.basename(out)
            index["images"][str(p)] = entry
        print(f"attention maps: {min(start + batch_size, len(paths))}"
              f"/{len(paths)}")

    index_path = os.path.join(output_dir, "attention_maps_index.json")
    with open(index_path, "w", encoding="utf-8") as f:
        json.dump(index, f, indent=2)
    print(f"wrote {len(index['images'])} images' maps to {output_dir}")
    return index
