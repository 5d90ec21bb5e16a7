from .autoencoder_kl import (
    AutoencoderKL,
    DiagonalGaussian,
    encode_scaled,
    decode_scaled,
)
from .taggers import (
    SpatialAttention,
    MultiHeadSelfAttention,
    CrossAttention,
    ClassificationDecoder,
    AttentionClassificationDecoder,
    create_attention_decoder,
)

__all__ = [
    "AutoencoderKL",
    "DiagonalGaussian",
    "encode_scaled",
    "decode_scaled",
    "SpatialAttention",
    "MultiHeadSelfAttention",
    "CrossAttention",
    "ClassificationDecoder",
    "AttentionClassificationDecoder",
    "create_attention_decoder",
]
