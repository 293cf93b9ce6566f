"""Native C++ image decoder (csrc/imgdec.cc) vs PIL oracles.

- PNG decode is lossless -> exact equality with PIL.
- JPEG decode uses the same islow IDCT family as PIL's bundled
  libjpeg-turbo -> allow +-2 per channel.
- The triangle resample mirrors Pillow's fixed-point scheme -> resize of
  an already-decoded PNG must be BIT-IDENTICAL to Image.resize(BILINEAR).
- grayscale handling: replicate (PIL convert("RGB")) and the reference's
  viridis LUT quirk (/root/reference/cc_dataloader.py:92-100), LUT
  applied before resize.
"""

import io

import numpy as np
import pytest
from PIL import Image

from captionax.data import native_image as ni

pytestmark = pytest.mark.skipif(
    not ni.native_available(), reason="native image library unavailable"
)


def _png_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _jpg_bytes(arr: np.ndarray, quality=92) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def _rand_rgb(h, w, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), np.uint8)


class TestDecode:
    def test_png_exact(self):
        arr = _rand_rgb(37, 53)
        got = ni.decode(_png_bytes(arr))
        np.testing.assert_array_equal(got, arr)

    def test_jpeg_close_to_pil(self):
        arr = _rand_rgb(48, 64, 1)
        data = _jpg_bytes(arr)
        ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        got = ni.decode(data)
        assert got.shape == ref.shape
        assert np.abs(got.astype(int) - ref.astype(int)).max() <= 2

    def test_gray_png_replicate(self):
        g = np.random.RandomState(2).randint(0, 256, (20, 30), np.uint8)
        got = ni.decode(_png_bytes(g))
        ref = np.asarray(Image.open(io.BytesIO(_png_bytes(g))).convert("RGB"))
        np.testing.assert_array_equal(got, ref)

    def test_gray_viridis_quirk(self):
        from captionax.data.transforms import grayscale_to_viridis

        g = np.arange(256, dtype=np.uint8).reshape(16, 16)
        got = ni.decode(_png_bytes(g), gray_mode=ni.GRAY_VIRIDIS)
        np.testing.assert_array_equal(got, grayscale_to_viridis(g))


class TestExoticFormats:
    """Formats beyond plain RGB: the native path must either match PIL
    or return an error status that routes the image to the PIL
    fallback — never a silently wrong image."""

    def _roundtrip(self, im: Image.Image, fmt="PNG", **save_kw):
        buf = io.BytesIO()
        im.save(buf, format=fmt, **save_kw)
        data = buf.getvalue()
        ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        got = ni.decode(data)
        return got, ref

    def test_palette_png(self):
        arr = _rand_rgb(25, 31, 11)
        got, ref = self._roundtrip(
            Image.fromarray(arr).quantize(64)  # mode P
        )
        np.testing.assert_array_equal(got, ref)

    def test_rgba_png_drops_alpha_like_pil(self):
        rgba = np.random.RandomState(12).randint(0, 256, (20, 20, 4), np.uint8)
        got, ref = self._roundtrip(Image.fromarray(rgba, "RGBA"))
        np.testing.assert_array_equal(got, ref)

    def test_16bit_gray_png(self):
        g16 = (np.random.RandomState(13).rand(18, 22) * 65535).astype("<u2")
        buf = io.BytesIO()
        Image.fromarray(g16, mode="I;16").save(buf, format="PNG")
        data = buf.getvalue()
        got = ni.decode(data)
        assert got.shape == (18, 22, 3)
        # native scales 16->8 bit like skimage (high byte +- rounding);
        # PIL's convert("L") instead SATURATES >255 to white — a PIL
        # quirk we deliberately do not copy
        ref = (g16 >> 8).astype(int)
        assert np.abs(got[..., 0].astype(int) - ref).max() <= 1

    def test_progressive_jpeg(self):
        arr = _rand_rgb(40, 40, 14)
        got, ref = self._roundtrip(
            Image.fromarray(arr), fmt="JPEG", progressive=True, quality=88
        )
        assert np.abs(got.astype(int) - ref.astype(int)).max() <= 2


class TestResize:
    @pytest.mark.parametrize("hw_in,hw_out", [
        ((300, 400), (224, 224)),   # downscale (the training path)
        ((100, 150), (224, 224)),   # upscale
        ((224, 224), (224, 224)),   # identity
        ((257, 123), (224, 224)),   # odd sizes
    ])
    def test_bit_identical_to_pil(self, hw_in, hw_out):
        arr = _rand_rgb(*hw_in, seed=3)
        data = _png_bytes(arr)  # lossless so only the resample differs
        ref = np.asarray(
            Image.fromarray(arr).resize((hw_out[1], hw_out[0]),
                                        Image.BILINEAR)
        )
        got = ni.decode_resize(data, hw_out)
        np.testing.assert_array_equal(got, ref)

    def test_viridis_applied_before_resize(self):
        from captionax.data.transforms import grayscale_to_viridis

        g = np.random.RandomState(4).randint(0, 256, (60, 80), np.uint8)
        ref = np.asarray(
            Image.fromarray(grayscale_to_viridis(g)).resize(
                (32, 24), Image.BILINEAR
            )
        )
        got = ni.decode_resize(_png_bytes(g), (24, 32),
                               gray_mode=ni.GRAY_VIRIDIS)
        np.testing.assert_array_equal(got, ref)


class TestBatch:
    def test_batch_matches_single_and_fallback(self):
        blobs = [
            _png_bytes(_rand_rgb(40, 50, 5)),
            _jpg_bytes(_rand_rgb(64, 48, 6)),
            b"not an image at all",          # -> PIL fallback -> error? no:
            _png_bytes(_rand_rgb(20, 20, 7)),
        ]
        # the corrupt entry must raise in the PIL fallback, so drop it for
        # the batch-vs-single comparison and test it separately
        ok = [blobs[0], blobs[1], blobs[3]]
        out = ni.decode_resize_batch(ok, (32, 32), threads=4)
        assert out.shape == (3, 32, 32, 3)
        for i, b in enumerate(ok):
            np.testing.assert_array_equal(out[i], ni.decode_resize(b, (32, 32)))

    def test_corrupt_bytes_raise_via_fallback(self):
        with pytest.raises(Exception):
            ni.decode_resize_batch([b"garbage"], (8, 8))

    def test_probe(self):
        import ctypes

        lib = ni._load()
        h, w = ctypes.c_int(0), ctypes.c_int(0)
        data = _jpg_bytes(_rand_rgb(33, 77, 8))
        assert lib.cx_img_probe(data, len(data), ctypes.byref(h),
                                ctypes.byref(w)) == 0
        assert (h.value, w.value) == (33, 77)


class TestLoader:
    def test_make_file_loader(self, tmp_path):
        arr = _rand_rgb(90, 120, 9)
        p = tmp_path / "img.png"
        p.write_bytes(_png_bytes(arr))
        loader = ni.make_file_loader(str(tmp_path), (224, 224))
        got = loader("img.png")
        ref = np.asarray(
            Image.fromarray(arr).resize((224, 224), Image.BILINEAR)
        )
        np.testing.assert_array_equal(got, ref)
