"""End-to-end chain on REAL image files: native decode -> transforms ->
encoder -> decode (scan beam + fused Pallas kernel).

Round 1 ran every e2e path on in-memory synthetic arrays; the committed
files under tests/fixtures/images/ (procedurally generated, so
license-free) exercise the actual file path the reference uses
(/root/reference/data_loader.py:196-218 skimage.io.imread + Rescale):
libjpeg/libpng decode, triangle resize to 224x224, ImageNet normalize,
ResNet features, then both decode implementations on those features.
"""

import os

import numpy as np
import pytest

import jax

from captionax.data.flickr import FlickrStyleData
from captionax.data.native_image import decode_resize, make_file_loader
from captionax.data.transforms import preprocess_images
from captionax.decode.search import beam_search, greedy
from captionax.models import decoder as dec
from captionax.models.encoder import encoder_cnn, resnet_init
from captionax.ops.decode_kernel import fused_greedy

IMG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "images")
NAMES = ["photo_gradient.jpg", "photo_shapes.png", "photo_gray.png"]

F = E = H = 16
V = 40


@pytest.fixture(scope="module")
def dataset(tiny_vocab):
    factual = [(n, f"a test image number {i} .")
               for i, n in enumerate(NAMES) for _ in range(5)]
    return FlickrStyleData(
        factual=factual,
        humour=["a funny caption ."] * len(NAMES),
        romantic=["a loving caption ."] * len(NAMES),
        vocab=tiny_vocab,
        image_loader=make_file_loader(IMG_DIR),
        max_len=8,
    )


class TestRealImageFiles:
    def test_native_decode_matches_pil(self):
        """The committed files through the native decoder must equal
        PIL's decode+resize bit-for-bit (the round-1 equality tests used
        synthetic blobs; these are real on-disk JPEG/PNG files)."""
        from PIL import Image

        for name in NAMES:
            path = os.path.join(IMG_DIR, name)
            with open(path, "rb") as f:
                blob = f.read()
            got = decode_resize(blob, (224, 224))
            ref = np.asarray(
                Image.open(path).convert("RGB").resize(
                    (224, 224), Image.BILINEAR
                )
            )
            np.testing.assert_array_equal(got, ref, err_msg=name)

    def test_batches_load_real_files(self, dataset):
        batches = list(dataset.batches(range(3), 3, style="factual",
                                       seed=0, shuffle=False))
        assert len(batches) == 1
        imgs = batches[0]["images"]
        assert imgs.shape == (3, 224, 224, 3) and imgs.dtype == np.uint8
        # the three files must decode to distinct content
        assert len({imgs[i].tobytes() for i in range(3)}) == 3

    def test_full_chain_to_beam(self, dataset):
        """files -> preprocess -> ResNet -> beam + fused kernel; the scan
        greedy and the Pallas kernel must pick identical tokens on real
        features (f32 kernels)."""
        batch = next(dataset.batches(range(3), 3, style="factual",
                                     seed=0, shuffle=False))
        key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        enc = resnet_init(k1, depth=50)
        feats = encoder_cnn(enc, preprocess_images(batch["images"]))
        assert feats.shape == (3, 49, 2048)
        assert np.isfinite(np.asarray(feats)).all()
        # distinct images must give distinct features
        f = np.asarray(feats)
        assert not np.allclose(f[0], f[1])

        params = dec.attention_gru_init(k2, 2048, F, E, H, V)
        res = beam_search(params, feats, k=3, max_steps=10)
        assert np.asarray(res.tokens).shape == (3, 11)

        scan_ids = np.asarray(greedy(params, feats, max_len=10))
        kern_ids = np.asarray(fused_greedy(
            params, feats, max_len=10, block_rows=8,
            interpret=True, f32=True,
        ))
        np.testing.assert_array_equal(scan_ids, kern_ids)
