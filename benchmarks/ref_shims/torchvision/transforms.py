"""torchvision.transforms shim — exactly the four transforms the reference
composes (modules.py:126-140), with torchvision's default semantics:
Resize = PIL bilinear (antialiased, as PIL resize always is), ToTensor =
HWC uint8 -> CHW float32 / 255, Normalize = (x - mean) / std per channel.
"""

from __future__ import annotations

import numpy as np
import torch
from PIL import Image


class Compose:
    def __init__(self, transforms_list):
        self.transforms = list(transforms_list)

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


class Resize:
    def __init__(self, size, interpolation=None, antialias=True):
        if isinstance(size, int):
            raise NotImplementedError(
                "shim implements the (H, W) form the reference uses")
        self.size = tuple(size)  # (H, W)

    def __call__(self, img: Image.Image) -> Image.Image:
        h, w = self.size
        return img.resize((w, h), Image.BILINEAR)


class ToTensor:
    def __call__(self, img) -> torch.Tensor:
        arr = np.asarray(img, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(arr.copy()).permute(2, 0, 1).contiguous()
        return t.to(torch.float32) / 255.0

    def __repr__(self):
        return "ToTensor()"


class Normalize:
    def __init__(self, mean, std, inplace=False):
        self.mean = torch.tensor(mean, dtype=torch.float32).view(-1, 1, 1)
        self.std = torch.tensor(std, dtype=torch.float32).view(-1, 1, 1)

    def __call__(self, t: torch.Tensor) -> torch.Tensor:
        return (t - self.mean) / self.std
