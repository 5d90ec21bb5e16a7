"""Minimal torchvision shim: the reference only uses
``torchvision.transforms`` Compose/Resize/ToTensor/Normalize
(/root/reference/modules.py:5,126-140)."""

from . import transforms  # noqa: F401
