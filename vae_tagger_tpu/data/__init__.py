from .paths import get_image_paths
from .bucketing import AspectRatioBucketing, SmartResize, load_and_transform_image
from .dataset import TaggedImageDataset, parse_weighted_tags
from .loader import BucketBatchSampler, DataLoader

__all__ = [
    "get_image_paths",
    "AspectRatioBucketing",
    "SmartResize",
    "load_and_transform_image",
    "TaggedImageDataset",
    "parse_weighted_tags",
    "BucketBatchSampler",
    "DataLoader",
]
