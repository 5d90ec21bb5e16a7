"""Aspect-ratio bucketing and aspect-preserving resize.

Behavior mirrors the reference (``/root/reference/modules.py:126-242``):
buckets are every (W, H) with W, H in [base, max] step ``bucket_step`` and
W*H <= max^2; each image goes to the closest-aspect bucket; SmartResize crops
to the bucket's aspect ratio then LANCZOS-resizes.

TPU-first differences:
- bucket assignment reads only the image *header* (PIL lazy open) — the
  reference also avoids decoding, but we make it explicit;
- every bucket is a static compiled shape; the loader (loader.py) batches
  per-bucket so XLA compiles one program per *used* bucket instead of
  recompiling per image;
- normalization to [-1, 1] happens on device (the transform returns uint8 HWC
  to keep host->device transfers 4x smaller than fp32).
"""

from __future__ import annotations

import io
import json
import os
import random
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image


def _jpeg_quality_factor() -> int:
    """JPEG decode policy for the native fused path.

    Default 2 = DCT-domain scaled decode (measured 27.4 vs 35 ms/image at
    1024px) — pixels stay within the parity tests' tolerance of PIL but are
    not identical to a full decode, so a fleet mixing native and PIL hosts
    sees small per-host pixel differences on the SAME jpeg.
    ``VAE_TAGGER_DECODE_EXACT=1`` forces a full decode (quality_factor 0):
    the native path then matches PIL within the resizer's ±1, and
    ``VAE_TAGGER_NATIVE_DECODE=0`` remains the bit-exact full-PIL switch."""
    return 0 if os.environ.get("VAE_TAGGER_DECODE_EXACT") == "1" else 2


class SmartResize:
    """Aspect-preserving crop to the target ratio, then LANCZOS resize.

    crop_mode: 'center' (default), 'random', or 'top'/'bottom' (maps to 0
    offset like the reference's else-branch).
    """

    def __init__(self, target_width: int, target_height: int,
                 crop_mode: str = "center"):
        self.target_width = target_width
        self.target_height = target_height
        self.crop_mode = crop_mode

    def __call__(self, img: Image.Image) -> Image.Image:
        ow, oh = img.size
        target_ratio = self.target_width / self.target_height
        original_ratio = ow / oh
        if original_ratio > target_ratio:
            nw = int(oh * target_ratio)
            nh = oh
            if self.crop_mode == "center":
                left = (ow - nw) // 2
            elif self.crop_mode == "random":
                left = random.randint(0, ow - nw)
            else:
                left = 0
            img = img.crop((left, 0, left + nw, nh))
        elif original_ratio < target_ratio:
            nw = ow
            nh = int(ow / target_ratio)
            if self.crop_mode == "center":
                top = (oh - nh) // 2
            elif self.crop_mode == "random":
                top = random.randint(0, oh - nh)
            else:
                top = 0
            img = img.crop((0, top, nw, top + nh))
        return img.resize((self.target_width, self.target_height),
                          Image.LANCZOS)


class AspectRatioBucketing:
    """Generates the bucket grid and assigns images by closest aspect ratio."""

    def __init__(self, base_resolution: int = 512, max_resolution: int = 1024,
                 bucket_step: int = 64):
        self.base_resolution = base_resolution
        self.max_resolution = max_resolution
        self.bucket_step = bucket_step
        self.buckets = self._generate_buckets()
        self.image_buckets: Dict[str, Tuple[int, int]] = {}

    def _generate_buckets(self) -> List[Tuple[int, int]]:
        buckets = []
        for width in range(self.base_resolution, self.max_resolution + 1,
                           self.bucket_step):
            for height in range(self.base_resolution, self.max_resolution + 1,
                                self.bucket_step):
                if width * height <= self.max_resolution ** 2:
                    buckets.append((width, height))
        return sorted(buckets)

    def assign_bucket_for_size(self, width: int, height: int) -> Tuple[int, int]:
        original_ratio = width / height
        best_bucket = None
        min_diff = float("inf")
        for bw, bh in self.buckets:
            diff = abs(bw / bh - original_ratio)
            if diff < min_diff:
                min_diff = diff
                best_bucket = (bw, bh)
        return best_bucket

    def assign_bucket(self, image_path,
                      manifest: Optional["ImageSizeManifest"] = None
                      ) -> Tuple[int, int]:
        """Assign by pixel size: manifest hit (no file open) or header read.
        Unreadable images fall back to the square base bucket
        (modules.py:219-222)."""
        size = manifest.lookup(image_path) if manifest is not None else None
        if size is None:
            size = read_image_size(image_path)
            if size is not None and manifest is not None:
                manifest.record(image_path, size)
        bucket = (self.assign_bucket_for_size(*size) if size is not None
                  else (self.base_resolution, self.base_resolution))
        self.image_buckets[str(image_path)] = bucket
        return bucket

    def get_bucket_statistics(self) -> Dict[Tuple[int, int], int]:
        counts: Dict[Tuple[int, int], int] = {}
        for bucket in self.image_buckets.values():
            counts[bucket] = counts.get(bucket, 0) + 1
        return counts

    def print_bucket_info(self) -> None:
        stats = self.get_bucket_statistics()
        print("aspect-ratio bucket statistics")
        print(f"generated {len(self.buckets)} buckets")
        print(f"used {len(stats)} buckets")
        total = max(1, len(self.image_buckets))
        for bucket, count in sorted(stats.items(), key=lambda x: x[1],
                                    reverse=True):
            w, h = bucket
            print(f"{w}x{h} (ratio {w / h:.2f}): {count} images "
                  f"({100.0 * count / total:.1f}%)")


def read_image_size(path) -> Optional[Tuple[int, int]]:
    """(width, height) from the image header only (PIL lazy open); None on
    unreadable files."""
    try:
        with Image.open(path) as img:
            return img.size
    except Exception as e:
        print(f"warning: could not analyze image {path}: {e}")
        return None


class ImageSizeManifest:
    """Persisted path -> (mtime_ns, file_size, width, height) cache.

    Bucket assignment must know every image's pixel size; reading 1M image
    headers on EVERY startup is the reference's scalability flaw
    (/root/reference/modules.py:553-556 re-opens each file per run).  This
    manifest makes warm restarts O(changed files): each path costs one
    os.stat, and only files whose (mtime_ns, size) changed — or new ones —
    get their header read again.  Pixel sizes (not bucket ids) are cached,
    so a manifest written under one (base, max, step) bucket grid stays
    valid under any other.

    The manifest lives alongside data.json (``<data>.bucket_manifest.json``)
    — keyed to the dataset, shared by every trainer/output dir.  Writes are
    atomic (temp + rename) so concurrent trainers can race harmlessly;
    unreadable datasets dirs degrade to a no-op cache.  Disable with
    ``VAE_TAGGER_NO_BUCKET_MANIFEST=1``.
    """

    VERSION = 1

    def __init__(self, manifest_file: Optional[str]):
        self.path = manifest_file
        self._entries: Dict[str, list] = {}
        self._dirty = False
        if manifest_file and os.path.exists(manifest_file):
            try:
                with open(manifest_file, "r", encoding="utf-8") as f:
                    payload = json.load(f)
                if payload.get("version") == self.VERSION:
                    self._entries = payload.get("entries", {})
            except Exception as e:
                print(f"warning: ignoring bucket manifest {manifest_file}: {e}")

    @classmethod
    def for_dataset(cls, json_path) -> "ImageSizeManifest":
        if os.environ.get("VAE_TAGGER_NO_BUCKET_MANIFEST") == "1":
            return cls(None)
        base = os.path.abspath(str(json_path))
        return cls(base + ".bucket_manifest.json")

    @staticmethod
    def _stat_key(path) -> Optional[Tuple[int, int]]:
        try:
            st = os.stat(path)
            return st.st_mtime_ns, st.st_size
        except OSError:
            return None

    def lookup(self, path) -> Optional[Tuple[int, int]]:
        """Cached (width, height) if the file is unchanged, else None."""
        entry = self._entries.get(str(path))
        if entry is None:
            return None
        key = self._stat_key(path)
        if key is None or list(key) != entry[:2]:
            return None
        return int(entry[2]), int(entry[3])

    def record(self, path, size: Tuple[int, int]) -> None:
        key = self._stat_key(path)
        if key is None:
            return
        self._entries[str(path)] = [key[0], key[1], int(size[0]),
                                    int(size[1])]
        self._dirty = True

    def save(self) -> None:
        if not self.path or not self._dirty:
            return
        tmp = f"{self.path}.tmp.{os.getpid()}"
        try:
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump({"version": self.VERSION, "entries": self._entries},
                          f)
            os.replace(tmp, self.path)
            self._dirty = False
        except OSError as e:  # read-only dataset dir: stay a warm-less cache
            print(f"warning: could not write bucket manifest "
                  f"{self.path}: {e}")
            try:
                os.unlink(tmp)
            except OSError:
                pass


def _native_smart_resize(img: Image.Image, width: int, height: int,
                         crop_mode: str) -> Optional[np.ndarray]:
    """Crop+Lanczos via the C++ library (vae_tagger_tpu/native) when built.
    Returns None to signal PIL fallback.  'random' crop offsets are drawn
    here so the sampling distribution matches SmartResize."""
    try:
        from .. import native
    except Exception:
        return None
    if not native.available():
        return None
    src = np.asarray(img, dtype=np.uint8)
    if src.ndim != 3 or src.shape[2] != 3:
        return None
    offset = (0, 0)
    mode = crop_mode
    if crop_mode == "random":
        oh, ow = src.shape[0], src.shape[1]
        target_ratio = width / height
        original_ratio = ow / oh
        if original_ratio > target_ratio:
            offset = (random.randint(0, ow - int(oh * target_ratio)), 0)
        elif original_ratio < target_ratio:
            offset = (0, random.randint(0, oh - int(ow / target_ratio)))
    try:
        return native.smart_resize(src, width, height, mode, offset)
    except Exception:
        return None


def _native_decode_resize(path, width: int, height: int, crop_mode: str,
                          resample: str = "lanczos"):
    """One-call decode + crop + resample via the C++ library
    (vae_tagger_tpu/native/decode.cpp): JPEG, PNG, and WebP, dispatched by
    magic bytes.  For JPEG, DCT-domain scaling keeps the decode >= 2x the
    target when possible.  Returns (result_or_None, bytes_or_None); the
    bytes let the PIL fallback skip a second disk read.

    Fused-path policy (re-measured round 3 on this host, 1536x1152 source
    -> 1024px target): the fused call wins for every format, INCLUDING
    full-scale JPEG (35.0 ms vs 38.2 pure-PIL — the round-2
    reject_full_scale policy predated the dispatch rework and no longer
    holds), PNG 85 vs 122 ms, WebP 39 vs 50 ms.
    """
    try:
        from .. import native
    except Exception:
        return None, None
    try:
        with open(path, "rb") as f:
            data = f.read()
        fmt = native.sniff_format(data)
        if fmt is None or fmt not in native.decode_formats():
            return None, data
        offset = (0, 0)
        if crop_mode == "random":
            oh, ow = native.image_info(data)
            target_ratio = width / height
            original_ratio = ow / oh
            if original_ratio > target_ratio:
                offset = (random.randint(0, ow - int(oh * target_ratio)), 0)
            elif original_ratio < target_ratio:
                offset = (0, random.randint(0, oh - int(ow / target_ratio)))
        return native.decode_image_resize(data, width, height, crop_mode,
                                          offset, quality_factor=_jpeg_quality_factor(),
                                          resample=resample), data
    except Exception:
        return None, None


def decode_bytes_square(data: bytes, resolution: int,
                        dtype=np.uint8) -> np.ndarray:
    """Raw image bytes -> (resolution, resolution, 3) uint8 via the
    reference's square distorting BILINEAR transform (modules.py:136-140).

    Single owner of the bytes-level decode policy shared by the file loader
    (square mode) and the HTTP server: fused native decode+resize when the
    C++ library is built (GIL-free on the 1-core host), PIL fallback
    otherwise.  Raises on undecodable bytes."""
    try:
        from .. import native

        # decode_image_resize sniffs the format itself and returns None for
        # anything it can't handle natively
        out = native.decode_image_resize(data, resolution, resolution,
                                         "distort", quality_factor=_jpeg_quality_factor(),
                                         resample="bilinear")
        if out is not None:
            return out.astype(dtype, copy=False)
    except Exception:
        pass
    img = Image.open(io.BytesIO(data)).convert("RGB")
    return np.asarray(img.resize((resolution, resolution), Image.BILINEAR),
                      dtype=dtype)


def load_and_transform_image(
    path,
    resolution: Optional[int] = None,
    bucket: Optional[Tuple[int, int]] = None,
    crop_mode: str = "center",
    dtype=np.uint8,
) -> np.ndarray:
    """Decode an image and resize it for the model; returns HWC uint8.

    - bucket given: SmartResize to (bucket_w, bucket_h)  [training bucket
      mode], via the native C++ Lanczos path when built (GIL-free, scales
      with the loader thread pool; PIL fallback otherwise)
    - else: square resize to (resolution, resolution) distorting aspect
      (the reference's plain transform, modules.py:136-140) — also native
      when built (bilinear filter, within ±1 of PIL's BILINEAR)

    Normalization to [-1, 1] is done on device (see ops/image.py) — the host
    hands over uint8.
    """
    if resolution is not None and bucket is None:
        # square mode shares the bytes-level policy with the HTTP server
        try:
            with open(path, "rb") as f:
                data = f.read()
        except (OSError, TypeError):
            data = None
        if data is not None:
            return decode_bytes_square(data, resolution, dtype=dtype)
        img = Image.open(path).convert("RGB")
        img = img.resize((resolution, resolution), Image.BILINEAR)
        return np.asarray(img, dtype=dtype)

    data = None
    if bucket is not None:
        out, data = _native_decode_resize(path, bucket[0], bucket[1],
                                          crop_mode)
        if out is not None:
            return out.astype(dtype, copy=False)
    # reuse the already-read bytes when the native path declined
    img = Image.open(io.BytesIO(data) if data is not None
                     else path).convert("RGB")
    if bucket is not None:
        out = _native_smart_resize(img, bucket[0], bucket[1], crop_mode)
        if out is not None:
            return out.astype(dtype, copy=False)
        img = SmartResize(bucket[0], bucket[1], crop_mode)(img)
    return np.asarray(img, dtype=dtype)


def decode_bytes_square_yuv(data: bytes,
                            resolution: int) -> Tuple[np.ndarray, np.ndarray]:
    """Raw image bytes -> planar YUV 4:2:0 at the square/distort transform.

    Bytes-level core of the YUV transfer path, shared by the file loader
    (:func:`load_and_transform_image_yuv`) and the HTTP server.  Returns
    ((res, res) luma, (2, res/2, res/2) chroma) uint8.  ``resolution`` must
    be even.  Raises on undecodable bytes."""
    if resolution % 2:
        raise ValueError(f"YUV 4:2:0 transfer needs an even resolution, "
                         f"got {resolution}")
    try:
        from .. import native
    except Exception:
        native = None
    if native is not None:
        try:
            out = native.decode_image_resize_yuv420(
                data, resolution, resolution, "distort",
                quality_factor=_jpeg_quality_factor(), resample="bilinear")
            if out is not None:
                return out
        except Exception:
            pass
    rgb = decode_bytes_square(data, resolution)
    if native is not None:
        return native.rgb_to_yuv420(rgb)
    from ..ops.image import rgb_to_yuv420_reference

    return rgb_to_yuv420_reference(rgb)


def load_and_transform_image_yuv(
    path,
    resolution: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode an image for the YUV transfer path; returns (Y, CbCr) planar
    4:2:0 uint8 — (res, res) luma + (2, res/2, res/2) chroma, 1.5 B/px.

    Inference-only square/distort transform (the reference's
    modules.py:136-140 semantics, like :func:`load_and_transform_image`'s
    square mode).  JPEGs decode straight to YCbCr with no host color
    conversion and chroma resampled directly to half target
    (native/decode.cpp); PNG/WebP and PIL fallbacks decode RGB and convert
    in one extra pass.  The device reconstitutes normalized RGB
    (ops/image.py::yuv420_to_normalized_rgb).  ``resolution`` must be even.
    """
    if resolution % 2:
        raise ValueError(f"YUV 4:2:0 transfer needs an even resolution, "
                         f"got {resolution}")
    data = None
    try:
        with open(path, "rb") as f:
            data = f.read()
    except (OSError, TypeError):
        data = None
    if data is not None:
        return decode_bytes_square_yuv(data, resolution)
    rgb = np.asarray(Image.open(path).convert("RGB").resize(
        (resolution, resolution), Image.BILINEAR), dtype=np.uint8)
    return to_yuv420(rgb)


def to_yuv420(rgb: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """HWC uint8 RGB -> (Y, CbCr) planar 4:2:0 uint8 (native one-pass
    converter, ~2 ms at 1024px; numpy fallback).  H and W must be even.

    This is the host half of the training-path YUV transfer: trainers
    keep the exact SmartResize/bucket RGB transform and convert the
    result, paying ~2 ms/image of host CPU for half the wire bytes
    (data/dataset.py ``transfer_format='yuv420'``)."""
    try:
        from .. import native

        return native.rgb_to_yuv420(rgb)
    except Exception:
        from ..ops.image import rgb_to_yuv420_reference

        return rgb_to_yuv420_reference(rgb)


def dummy_image(width: int = 512, height: int = 512) -> np.ndarray:
    """Black placeholder for unreadable images (modules.py:717-729)."""
    return np.zeros((height, width, 3), dtype=np.uint8)
