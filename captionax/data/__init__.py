from captionax.data.flickr import (
    FlickrStyleData,
    load_factual_captions,
    load_styled_captions,
)
from captionax.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    load_image,
    preprocess_images,
)
from captionax.data.synthetic import synthetic_flickr_style
from captionax.data.loader import BatchLoader

__all__ = [
    "FlickrStyleData",
    "load_factual_captions",
    "load_styled_captions",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "load_image",
    "preprocess_images",
    "synthetic_flickr_style",
    "BatchLoader",
]
