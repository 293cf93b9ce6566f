"""Image pipeline: host decode, device resize + normalize.

The reference resizes with skimage on CPU dataloader workers
(/root/reference/data_loader.py:196-218 Rescale -> ToTensor -> ImageNet
normalize).  Here the host only decodes bytes to a uint8 array; resize to
224x224 and mean/std normalization run **on device as one XLA program**
(jax.image.resize is bilinear like skimage's default order=1), feeding the
encoder without a second host round-trip.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def load_image(path: str) -> np.ndarray:
    """Decode an image file to uint8 RGB [H, W, 3] on the host (PIL)."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def grayscale_to_viridis(img: np.ndarray) -> np.ndarray:
    """CC loader quirk: grayscale images are mapped through the viridis
    colormap, not replicated (/root/reference/cc_dataloader.py:92-100)."""
    try:
        from matplotlib import cm

        lut = (np.asarray(cm.viridis.colors) * 255).astype(np.uint8)  # [256,3]
        return lut[img]
    except ImportError:  # pragma: no cover
        return np.stack([img] * 3, axis=-1)


@jax.jit
def preprocess_images(images: jnp.ndarray) -> jnp.ndarray:
    """uint8 [B, H, W, 3] -> normalized float32 [B, 224, 224, 3] on device."""
    x = images.astype(jnp.float32) / 255.0
    x = jax.image.resize(
        x, (images.shape[0], 224, 224, 3), method="bilinear"
    )
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (x - mean) / std


def host_resize(img: np.ndarray, size: Tuple[int, int] = (224, 224)) -> np.ndarray:
    """Host-side resize for sources with heterogeneous shapes (the device
    path needs fixed input shapes; callers resize ragged images here)."""
    from PIL import Image

    return np.asarray(
        Image.fromarray(img).resize((size[1], size[0]), Image.BILINEAR),
        dtype=np.uint8,
    )
