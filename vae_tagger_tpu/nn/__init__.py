from .blocks import (
    GroupNorm,
    ResnetBlock,
    Downsample,
    Upsample,
    VAEAttention,
    MidBlock,
    DownEncoderBlock,
    UpDecoderBlock,
)

__all__ = [
    "GroupNorm",
    "ResnetBlock",
    "Downsample",
    "Upsample",
    "VAEAttention",
    "MidBlock",
    "DownEncoderBlock",
    "UpDecoderBlock",
]
