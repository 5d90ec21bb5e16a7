"""ctypes binding for the native image-preprocessing library.

Builds ``libvtnative.so`` from resize.cpp + decode.cpp on first use
(g++ -O3, cached next to the source) and exposes:

- :func:`smart_resize` — SmartResize semantics (aspect-preserving crop +
  Lanczos-3 or bilinear resample) in C++;
- :func:`decode_jpeg_resize` / :func:`decode_png_resize` /
  :func:`decode_webp_resize` — format-specific decode fused with the
  crop+resize (JPEG additionally uses DCT-domain scaling when the target is
  much smaller than the source — the loader bottleneck on 1-core hosts);
- :func:`decode_image_resize` — one call that sniffs the magic bytes and
  dispatches to whichever fused decoder is built;
- :func:`image_info` / :func:`jpeg_info` — header-only (height, width).

The build degrades gracefully: JPEG+PNG+WebP -> JPEG-only -> resize-only ->
PIL everywhere, depending on which dev libraries exist at build time.
``available()`` / ``decode_available()`` / ``decode_formats()`` report what
the loaded library can do.

Disable explicitly with ``VAE_TAGGER_NATIVE_RESIZE=0`` (everything) or
``VAE_TAGGER_NATIVE_DECODE=0`` (decode only).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "resize.cpp")
_SRC_DECODE = os.path.join(_DIR, "decode.cpp")
_SO = os.path.join(_DIR, "libvtnative.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_CROP_MODES = {"center": 0, "top": 1, "bottom": 1, "left": 1, "right": 1,
               "random": 2, "distort": 3}
_FILTERS = {"lanczos": 0, "bilinear": 1}

# magic bytes -> format name (dispatch for decode_image_resize)
_JPEG_MAGIC = b"\xff\xd8"
_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def sniff_format(data: bytes) -> Optional[str]:
    """'jpeg' | 'png' | 'webp' | None from the leading magic bytes."""
    if data[:2] == _JPEG_MAGIC:
        return "jpeg"
    if data[:8] == _PNG_MAGIC:
        return "png"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    return None


def _try_build(extra_srcs, extra_flags) -> bool:
    cmd = (["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _SO,
            _SRC] + extra_srcs + extra_flags)
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        detail = getattr(e, "stderr", b"")
        detail = detail.decode(errors="replace")[-500:] if detail else e
        print(f"native build failed ({' '.join(extra_flags) or 'resize-only'}"
              f"): {detail}")
        return False


def _build() -> bool:
    # widest first; each rung drops the library the previous one needed.
    # Delete libvtnative.so to retry after installing dev packages.
    for extra_srcs, extra_flags in (
        ([_SRC_DECODE], ["-DVT_HAVE_PNG", "-DVT_HAVE_WEBP",
                         "-ljpeg", "-lpng16", "-lwebp"]),
        ([_SRC_DECODE], ["-ljpeg"]),
        ([], []),
    ):
        if _try_build(extra_srcs, extra_flags):
            return True
    print("native resize build failed (falling back to PIL)")
    return False


_DECODERS = {  # format -> (info symbol, decode symbol, has jpeg-only args)
    "jpeg": ("vt_jpeg_info", "vt_jpeg_decode_resize"),
    "png": ("vt_png_info", "vt_png_decode_resize"),
    "webp": ("vt_webp_info", "vt_webp_decode_resize"),
}


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("VAE_TAGGER_NATIVE_RESIZE", "1") == "0":
            return None
        srcs_mtime = max(os.path.getmtime(_SRC),
                         os.path.getmtime(_SRC_DECODE))
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < srcs_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            i32p = ctypes.POINTER(ctypes.c_int)
            lib.vt_smart_resize_filter.restype = ctypes.c_int
            lib.vt_smart_resize_filter.argtypes = [
                u8p, ctypes.c_int, ctypes.c_int,
                u8p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            if hasattr(lib, "vt_rgb_to_yuv420"):
                lib.vt_rgb_to_yuv420.restype = ctypes.c_int
                lib.vt_rgb_to_yuv420.argtypes = [
                    u8p, ctypes.c_int, ctypes.c_int, u8p, u8p, u8p,
                ]
            if hasattr(lib, "vt_jpeg_decode_resize_yuv420"):
                lib.vt_jpeg_decode_resize_yuv420.restype = ctypes.c_int
                lib.vt_jpeg_decode_resize_yuv420.argtypes = [
                    u8p, ctypes.c_size_t, u8p, u8p, u8p,
                    ctypes.c_int, ctypes.c_int,
                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.c_int, ctypes.c_int,
                ]
            if hasattr(lib, "vt_webp_decode_resize_yuv420"):
                lib.vt_webp_decode_resize_yuv420.restype = ctypes.c_int
                lib.vt_webp_decode_resize_yuv420.argtypes = [
                    u8p, ctypes.c_size_t, u8p, u8p, u8p,
                    ctypes.c_int, ctypes.c_int,
                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.c_int,
                ]
            for fmt, (info_sym, dec_sym) in _DECODERS.items():
                if not hasattr(lib, dec_sym):
                    continue
                info = getattr(lib, info_sym)
                info.restype = ctypes.c_int
                info.argtypes = [u8p, ctypes.c_size_t, i32p, i32p]
                dec = getattr(lib, dec_sym)
                dec.restype = ctypes.c_int
                dec.argtypes = [
                    u8p, ctypes.c_size_t, u8p, ctypes.c_int, ctypes.c_int,
                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ] + ([ctypes.c_int, ctypes.c_int] if fmt == "jpeg" else []) \
                  + [ctypes.c_int]
            _lib = lib
        except OSError as e:
            print(f"native resize load failed (falling back to PIL): {e}")
            _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def smart_resize(src: np.ndarray, target_width: int, target_height: int,
                 crop_mode: str = "center",
                 crop_offset: tuple[int, int] = (0, 0),
                 resample: str = "lanczos") -> np.ndarray:
    """Aspect-preserving crop + resample of an HWC uint8 RGB array.

    ``resample``: 'lanczos' (SmartResize/training parity) or 'bilinear'
    (the reference's inference transform, used with crop_mode='distort').
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native resize library unavailable")
    src = np.ascontiguousarray(src, dtype=np.uint8)
    if src.ndim != 3 or src.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) uint8, got {src.shape}")
    dst = np.empty((target_height, target_width, 3), dtype=np.uint8)
    rc = lib.vt_smart_resize_filter(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        src.shape[0], src.shape[1],
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        target_height, target_width,
        _CROP_MODES.get(crop_mode, 0), crop_offset[0], crop_offset[1],
        _FILTERS[resample],
    )
    if rc != 0:
        raise RuntimeError(f"vt_smart_resize failed with code {rc}")
    return dst


def decode_formats() -> frozenset:
    """The image formats the loaded library can decode natively."""
    lib = _load()
    if lib is None or os.environ.get("VAE_TAGGER_NATIVE_DECODE", "1") == "0":
        return frozenset()
    return frozenset(f for f, (_, dec) in _DECODERS.items()
                     if hasattr(lib, dec))


def decode_available(fmt: str = "jpeg") -> bool:
    return fmt in decode_formats()


def _info(fmt: str, data: bytes) -> tuple[int, int]:
    lib = _load()
    if lib is None or not hasattr(lib, _DECODERS[fmt][0]):
        raise RuntimeError(f"native {fmt} decoder unavailable")
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = getattr(lib, _DECODERS[fmt][0])(buf, len(data), ctypes.byref(h),
                                         ctypes.byref(w))
    if rc != 0:
        raise RuntimeError(f"vt_{fmt}_info failed with code {rc}")
    return h.value, w.value


def jpeg_info(data: bytes) -> tuple[int, int]:
    """(height, width) from a JPEG header, without decoding."""
    return _info("jpeg", data)


def image_info(data: bytes) -> tuple[int, int]:
    """(height, width) from any supported format's header."""
    fmt = sniff_format(data)
    if fmt is None:
        raise RuntimeError("unrecognized image format")
    return _info(fmt, data)


def _decode_resize(fmt: str, data: bytes, target_width: int,
                   target_height: int, crop_mode: str,
                   crop_offset: tuple[int, int], quality_factor: int,
                   reject_full_scale: bool,
                   resample: str) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None or not hasattr(lib, _DECODERS[fmt][1]):
        raise RuntimeError(f"native {fmt} decoder unavailable")
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    dst = np.empty((target_height, target_width, 3), dtype=np.uint8)
    args = [buf, len(data),
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            target_height, target_width,
            _CROP_MODES.get(crop_mode, 0), crop_offset[0], crop_offset[1]]
    if fmt == "jpeg":
        args += [quality_factor, int(reject_full_scale)]
    args += [_FILTERS[resample]]
    rc = getattr(lib, _DECODERS[fmt][1])(*args)
    if rc == 1:
        return None
    if rc != 0:
        raise RuntimeError(f"{_DECODERS[fmt][1]} failed with code {rc}")
    return dst


def decode_jpeg_resize(data: bytes, target_width: int, target_height: int,
                       crop_mode: str = "center",
                       crop_offset: tuple[int, int] = (0, 0),
                       quality_factor: int = 2,
                       reject_full_scale: bool = False,
                       resample: str = "lanczos") -> Optional[np.ndarray]:
    """JPEG decode + SmartResize in one native call.

    ``quality_factor`` q > 0 lets libjpeg decode at a reduced DCT scale as
    long as the crop window stays >= q x the target on both axes (q=0 forces
    a full decode, which matches PIL-decode + native-resize exactly).
    ``crop_offset`` for 'random' mode is in FULL-RESOLUTION coordinates.
    With ``reject_full_scale`` the call returns None (without decoding) when
    DCT scaling cannot engage — the scale decision stays in C++.  q=0
    overrides ``reject_full_scale``: an explicit full-decode request always
    decodes.
    """
    return _decode_resize("jpeg", data, target_width, target_height,
                          crop_mode, crop_offset, quality_factor,
                          reject_full_scale, resample)


def decode_png_resize(data: bytes, target_width: int, target_height: int,
                      crop_mode: str = "center",
                      crop_offset: tuple[int, int] = (0, 0),
                      resample: str = "lanczos") -> Optional[np.ndarray]:
    """PNG decode + crop + resize in one native call (alpha dropped,
    PIL ``convert("RGB")`` semantics).

    Returns None for 16-bit PNGs: libpng's 8-bit conversion is a
    linear->sRGB gamma encode, not PIL's plain bit-depth reduction, so
    those decode via the PIL fallback to keep pixels decoder-invariant.
    """
    return _decode_resize("png", data, target_width, target_height,
                          crop_mode, crop_offset, 0, False, resample)


def decode_webp_resize(data: bytes, target_width: int, target_height: int,
                       crop_mode: str = "center",
                       crop_offset: tuple[int, int] = (0, 0),
                       resample: str = "lanczos") -> np.ndarray:
    """WebP decode + crop + resize in one native call (alpha dropped)."""
    return _decode_resize("webp", data, target_width, target_height,
                          crop_mode, crop_offset, 0, False, resample)


def rgb_to_yuv420(rgb: np.ndarray):
    """HWC uint8 RGB -> (Y (H, W), CbCr (2, H/2, W/2)) planar 4:2:0.

    BT.601 full-range forward matrix with 2x2 box-averaged chroma (the JFIF
    convention the device-side reconstitution inverts,
    ops/image.py::yuv420_to_normalized_rgb).  H and W must be even.  Uses
    the native converter when built; numpy fallback otherwise (same math,
    rounding may differ by 1 ULP at .5 boundaries).
    """
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) uint8, got {rgb.shape}")
    h, w = rgb.shape[:2]
    if h % 2 or w % 2:
        raise ValueError(f"YUV 4:2:0 needs even dims, got {h}x{w}")
    lib = _load()
    if lib is not None and hasattr(lib, "vt_rgb_to_yuv420"):
        y = np.empty((h, w), np.uint8)
        cbcr = np.empty((2, h // 2, w // 2), np.uint8)
        u8 = ctypes.POINTER(ctypes.c_uint8)
        rc = lib.vt_rgb_to_yuv420(
            rgb.ctypes.data_as(u8), h, w, y.ctypes.data_as(u8),
            cbcr[0].ctypes.data_as(u8), cbcr[1].ctypes.data_as(u8))
        if rc == 0:
            return y, cbcr
    # numpy fallback (identical math; jax-free so the loader can run thin)
    x = rgb.astype(np.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    yp = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    def box2(p):
        return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2]
                + p[1::2, 1::2]) * 0.25

    y = np.clip(np.round(yp), 0, 255).astype(np.uint8)
    cbcr = np.clip(np.round(np.stack([box2(cb), box2(cr)])), 0,
                   255).astype(np.uint8)
    return y, cbcr


def decode_jpeg_resize_yuv420(data: bytes, target_width: int,
                              target_height: int, crop_mode: str = "center",
                              crop_offset: tuple[int, int] = (0, 0),
                              quality_factor: int = 2,
                              resample: str = "lanczos"):
    """JPEG decode + SmartResize straight to planar YUV 4:2:0.

    Skips libjpeg's YCbCr->RGB conversion and resamples chroma directly to
    half the target — the host half of the YUV transfer path (1.5 B/px to
    the device; ops/image.py::yuv420_to_normalized_rgb reconstitutes RGB
    on device).  Returns (Y (H, W) uint8, CbCr (2, H/2, W/2) uint8), or
    None when this path does not serve the file (RGB/CMYK JPEGs — caller
    decodes RGB and converts) or the decoder is not built.  Target dims
    must be even.  DCT scaling via ``quality_factor`` as in
    :func:`decode_jpeg_resize`.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "vt_jpeg_decode_resize_yuv420"):
        return None
    if target_height % 2 or target_width % 2:
        raise ValueError(
            f"YUV 4:2:0 needs even target dims, got "
            f"{target_height}x{target_width}")
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    y = np.empty((target_height, target_width), np.uint8)
    cbcr = np.empty((2, target_height // 2, target_width // 2), np.uint8)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    rc = lib.vt_jpeg_decode_resize_yuv420(
        buf, len(data), y.ctypes.data_as(u8), cbcr[0].ctypes.data_as(u8),
        cbcr[1].ctypes.data_as(u8), target_height, target_width,
        _CROP_MODES.get(crop_mode, 0), crop_offset[0], crop_offset[1],
        quality_factor, _FILTERS[resample])
    if rc == 2:
        return None  # unsupported JPEG colorspace: use the RGB path
    if rc != 0:
        raise RuntimeError(f"vt_jpeg_decode_resize_yuv420 failed: {rc}")
    return y, cbcr


def decode_webp_resize_yuv420(data: bytes, target_width: int,
                              target_height: int, crop_mode: str = "center",
                              crop_offset: tuple[int, int] = (0, 0),
                              resample: str = "lanczos"):
    """Lossy-WebP decode + SmartResize straight to planar YUV 4:2:0.

    VP8 is natively BT.601 limited-range YCbCr 4:2:0 — the coded planes are
    resampled directly (no chroma upsample, no color conversion on the
    host) and range-expanded to the full-range wire format the device
    converter expects.  Returns (Y (H, W) uint8, CbCr (2, H/2, W/2) uint8),
    or None when the file is lossless/animated (RGB-coded: caller decodes
    RGB and converts) or the decoder is not built.  Target dims must be
    even."""
    lib = _load()
    if lib is None or not hasattr(lib, "vt_webp_decode_resize_yuv420"):
        return None
    if target_height % 2 or target_width % 2:
        raise ValueError(
            f"YUV 4:2:0 needs even target dims, got "
            f"{target_height}x{target_width}")
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    y = np.empty((target_height, target_width), np.uint8)
    cbcr = np.empty((2, target_height // 2, target_width // 2), np.uint8)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    rc = lib.vt_webp_decode_resize_yuv420(
        buf, len(data), y.ctypes.data_as(u8), cbcr[0].ctypes.data_as(u8),
        cbcr[1].ctypes.data_as(u8), target_height, target_width,
        _CROP_MODES.get(crop_mode, 0), crop_offset[0], crop_offset[1],
        _FILTERS[resample])
    if rc == 2:
        return None  # lossless/animated: use the RGB path
    if rc != 0:
        raise RuntimeError(f"vt_webp_decode_resize_yuv420 failed: {rc}")
    return y, cbcr


def decode_image_resize_yuv420(data: bytes, target_width: int,
                               target_height: int, crop_mode: str = "center",
                               crop_offset: tuple[int, int] = (0, 0),
                               quality_factor: int = 2,
                               resample: str = "lanczos"):
    """Any supported format -> planar YUV 4:2:0 (Y, CbCr), or None.

    JPEGs decode straight to YCbCr and lossy WebPs straight to their coded
    VP8 planes (no color conversion anywhere on the host); PNG and
    lossless/animated WebP decode+resize to RGB natively and convert in
    one extra pass.  None = no native decoder for these bytes (caller
    decodes via PIL and converts with :func:`rgb_to_yuv420`).
    """
    fmt = sniff_format(data)
    if fmt == "jpeg" and decode_available("jpeg"):
        out = decode_jpeg_resize_yuv420(data, target_width, target_height,
                                        crop_mode, crop_offset,
                                        quality_factor, resample)
        if out is not None:
            return out
        # fall through: exotic-colorspace JPEG via the RGB decoder
    if fmt == "webp" and decode_available("webp"):
        out = decode_webp_resize_yuv420(data, target_width, target_height,
                                        crop_mode, crop_offset, resample)
        if out is not None:
            return out
        # fall through: lossless/animated WebP via the RGB decoder
    rgb = decode_image_resize(data, target_width, target_height, crop_mode,
                              crop_offset, quality_factor, False, resample)
    if rgb is None:
        return None
    return rgb_to_yuv420(rgb)


def decode_image_resize(data: bytes, target_width: int, target_height: int,
                        crop_mode: str = "center",
                        crop_offset: tuple[int, int] = (0, 0),
                        quality_factor: int = 2,
                        reject_full_scale: bool = False,
                        resample: str = "lanczos") -> Optional[np.ndarray]:
    """Sniff the format and decode+resize in one native call.

    Returns None when the format is not natively decodable (caller falls
    back to PIL) or when a JPEG's ``reject_full_scale`` fires.
    """
    fmt = sniff_format(data)
    if fmt is None or fmt not in decode_formats():
        return None
    return _decode_resize(fmt, data, target_width, target_height, crop_mode,
                          crop_offset, quality_factor, reject_full_scale,
                          resample)
