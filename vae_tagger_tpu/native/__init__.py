"""ctypes binding for the native image-preprocessing library.

Builds ``libvtnative.so`` from resize.cpp + decode.cpp on first use
(g++ -O3 -ljpeg, cached next to the source) and exposes:

- :func:`smart_resize` — SmartResize semantics (aspect-preserving crop +
  Lanczos-3 resample) in C++;
- :func:`jpeg_info` / :func:`decode_jpeg_resize` — libjpeg(-turbo) decode
  fused with the crop+resize, using DCT-domain scaling when the target is
  much smaller than the source (the loader bottleneck on 1-core hosts).

Falls back cleanly: ``available()`` / ``decode_available()`` are False when
no compiler or libjpeg is present, and callers keep using the PIL path.

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


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _SO, _SRC, _SRC_DECODE, "-ljpeg"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        # no libjpeg dev on this host (or a decode.cpp regression): say so,
        # then build the resize-only library.  Delete libvtnative.so to
        # retry the full build after installing libjpeg-dev.
        detail = getattr(e, "stderr", b"")
        detail = detail.decode(errors="replace")[-500:] if detail else e
        print(f"native decode build failed (resize-only fallback; "
              f"delete {_SO} to retry): {detail}")
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-o", _SO, _SRC]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return True
        except Exception as e:
            print(f"native resize build failed (falling back to PIL): {e}")
            return False


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
            lib.vt_smart_resize.restype = ctypes.c_int
            lib.vt_smart_resize.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            if hasattr(lib, "vt_jpeg_decode_resize"):
                lib.vt_jpeg_info.restype = ctypes.c_int
                lib.vt_jpeg_info.argtypes = [
                    ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
                    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ]
                lib.vt_jpeg_decode_resize.restype = ctypes.c_int
                lib.vt_jpeg_decode_resize.argtypes = [
                    ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
                    ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.c_int,
                ]
            _lib = lib
        except OSError as e:
            print(f"native resize load failed (falling back to PIL): {e}")
            _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def smart_resize(src: np.ndarray, target_width: int, target_height: int,
                 crop_mode: str = "center",
                 crop_offset: tuple[int, int] = (0, 0)) -> np.ndarray:
    """Aspect-preserving crop + Lanczos-3 resize of an HWC uint8 RGB array."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native resize library unavailable")
    src = np.ascontiguousarray(src, dtype=np.uint8)
    if src.ndim != 3 or src.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) uint8, got {src.shape}")
    dst = np.empty((target_height, target_width, 3), dtype=np.uint8)
    rc = lib.vt_smart_resize(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        src.shape[0], src.shape[1],
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        target_height, target_width,
        _CROP_MODES.get(crop_mode, 0), crop_offset[0], crop_offset[1],
    )
    if rc != 0:
        raise RuntimeError(f"vt_smart_resize failed with code {rc}")
    return dst


def decode_available() -> bool:
    lib = _load()
    if lib is None or not hasattr(lib, "vt_jpeg_decode_resize"):
        return False
    return os.environ.get("VAE_TAGGER_NATIVE_DECODE", "1") != "0"


def jpeg_info(data: bytes) -> tuple[int, int]:
    """(height, width) from a JPEG header, without decoding."""
    lib = _load()
    if lib is None or not hasattr(lib, "vt_jpeg_info"):
        raise RuntimeError("native jpeg decoder unavailable")
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.vt_jpeg_info(buf, len(data), ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise RuntimeError(f"vt_jpeg_info failed with code {rc}")
    return h.value, w.value


def decode_jpeg_resize(data: bytes, target_width: int, target_height: int,
                       crop_mode: str = "center",
                       crop_offset: tuple[int, int] = (0, 0),
                       quality_factor: int = 2,
                       reject_full_scale: bool = False
                       ) -> Optional[np.ndarray]:
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
    lib = _load()
    if lib is None or not hasattr(lib, "vt_jpeg_decode_resize"):
        raise RuntimeError("native jpeg decoder unavailable")
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    dst = np.empty((target_height, target_width, 3), dtype=np.uint8)
    rc = lib.vt_jpeg_decode_resize(
        buf, len(data),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        target_height, target_width,
        _CROP_MODES.get(crop_mode, 0), crop_offset[0], crop_offset[1],
        quality_factor, int(reject_full_scale),
    )
    if rc == 1:
        return None
    if rc != 0:
        raise RuntimeError(f"vt_jpeg_decode_resize failed with code {rc}")
    return dst
