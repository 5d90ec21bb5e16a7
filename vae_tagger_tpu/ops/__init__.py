from .normalization import group_norm, layer_norm
from .pooling import adaptive_avg_pool_nhwc, adaptive_max_pool_nhwc
from .attention import spatial_single_head_attention
from . import backend

__all__ = [
    "group_norm",
    "layer_norm",
    "adaptive_avg_pool_nhwc",
    "adaptive_max_pool_nhwc",
    "spatial_single_head_attention",
    "backend",
]
