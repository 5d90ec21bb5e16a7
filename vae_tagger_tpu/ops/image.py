"""On-device image ops.

The reference normalizes on host CPU (torchvision ToTensor+Normalize,
modules.py:129-139); we ship uint8 to the device (4x smaller transfers) and
normalize there — XLA fuses it into the first conv.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_uint8(pixels, dtype=jnp.float32):
    """HWC/NHWC uint8 [0,255] -> dtype in [-1, 1].

    Matches ToTensor (x/255) + Normalize(mean .5, std .5): x/127.5 - 1.
    """
    return pixels.astype(dtype) / jnp.asarray(127.5, dtype) - jnp.asarray(1.0, dtype)
