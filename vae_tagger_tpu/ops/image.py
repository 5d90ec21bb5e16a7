"""On-device image ops.

The reference normalizes on host CPU (torchvision ToTensor+Normalize,
modules.py:129-139); we ship uint8 to the device (4x smaller transfers) and
normalize there — XLA fuses it into the first conv.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_uint8(pixels, dtype=jnp.float32):
    """HWC/NHWC uint8 [0,255] -> dtype in [-1, 1].

    Matches ToTensor (x/255) + Normalize(mean .5, std .5): x/127.5 - 1.
    """
    return pixels.astype(dtype) / jnp.asarray(127.5, dtype) - jnp.asarray(1.0, dtype)


def yuv420_to_rgb_uint8(y, cbcr):
    """Planar YUV 4:2:0 uint8 -> NHWC uint8 RGB on device.

    Chroma is bilinearly upsampled 2x at half-pixel centers (JFIF's
    centered chroma siting) and converted with the BT.601 full-range
    matrix libjpeg itself uses, then rounded/clamped to the uint8 grid —
    exactly the pixels libjpeg's own RGB output path would have shipped.
    Feeding the result to :func:`normalize_uint8` therefore reproduces
    the RGB transfer path bit-for-bit given the same YCbCr source (the
    training steps rely on this equivalence, train/steps.py).

    Args:
      y:    (B, H, W) uint8 luma.
      cbcr: (B, 2, H/2, W/2) uint8 chroma (Cb plane then Cr plane).

    Returns (B, H, W, 3) uint8 RGB.
    """
    b, h, w = y.shape
    yf = y.astype(jnp.float32)
    cf = cbcr.astype(jnp.float32) - 128.0
    # bilinear 2x with half-pixel-center alignment (jax.image 'linear')
    cf = jax.image.resize(cf, (b, 2, h, w), method="linear")
    cb, cr = cf[:, 0], cf[:, 1]
    r = yf + 1.402 * cr
    g = yf - 0.344136 * cb - 0.714136 * cr
    bl = yf + 1.772 * cb
    rgb = jnp.stack([r, g, bl], axis=-1)
    return jnp.clip(jnp.round(rgb), 0.0, 255.0).astype(jnp.uint8)


def yuv420_to_normalized_rgb(y, cbcr, dtype=jnp.float32):
    """Planar YUV 4:2:0 uint8 -> normalized NHWC RGB in [-1, 1].

    The host ships each image as a full-resolution luma plane plus
    quarter-resolution chroma — 1.5 bytes/pixel instead of RGB's 3 — and
    this op reconstitutes the reference's normalized RGB tensor on device
    (the YUV-transfer analogue of :func:`normalize_uint8`; see
    native/decode.cpp's YCbCr output path).  The result tracks the RGB
    decode path to within chroma-resample error.

    Args:
      y:    (B, H, W) uint8 luma.
      cbcr: (B, 2, H/2, W/2) uint8 chroma (Cb plane then Cr plane).
      dtype: output dtype (the model's compute dtype).

    Returns (B, H, W, 3) ``dtype`` in [-1, 1].
    """
    return normalize_uint8(yuv420_to_rgb_uint8(y, cbcr), dtype)


def rgb_to_yuv420_reference(rgb_u8):
    """Host-side numpy oracle: HWC uint8 RGB -> (Y, CbCr) planar 4:2:0.

    Mirrors native/resize.cpp::vt_rgb_to_yuv420 (BT.601 full-range forward
    matrix, 2x2 box-averaged chroma) for parity tests and as the pure-Python
    fallback when the native library is unavailable.  H and W must be even.
    """
    import numpy as np

    x = rgb_u8.astype(np.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    yp = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    y_out = np.clip(np.round(yp), 0, 255).astype(np.uint8)

    def box2(p):
        return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2]
                + p[1::2, 1::2]) * 0.25

    cbcr = np.stack([box2(cb), box2(cr)])
    return y_out, np.clip(np.round(cbcr), 0, 255).astype(np.uint8)
