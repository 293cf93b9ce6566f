"""ctypes bindings for the native image decoder (csrc/imgdec.cc).

The reference decodes and rescales every image with skimage inside torch
DataLoader worker processes (/root/reference/data_loader.py:196-218,
cc_dataloader.py:92-100).  Here decode (libjpeg/libpng), the
grayscale->viridis CC quirk, and a Pillow-bit-identical triangle resize
run in one C++ call, batched over a thread pool — so the host image
pipeline keeps up with the TPU without Python in the per-image loop.

Any image the native path cannot handle (exotic format, corrupt bytes)
falls back to PIL per image; if the shared library is missing or the
toolchain can't build it, everything falls back to PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_SO = os.path.join(_CSRC, "libcaptionax_img.so")

GRAY_REPLICATE = 0  # PIL convert("RGB") semantics
GRAY_VIRIDIS = 1    # reference CC quirk (LUT applied before resize)


_LOAD_LOCK = threading.Lock()
_LOAD_FAILED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LOAD_FAILED
    if _LIB is not None:
        return _LIB
    if _LOAD_FAILED:  # don't re-run make per image after a failed build
        return None
    with _LOAD_LOCK:
        if _LIB is not None:
            return _LIB
        if _LOAD_FAILED:
            return None
        return _load_locked()


def _load_locked() -> Optional[ctypes.CDLL]:
    global _LIB, _LOAD_FAILED
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _CSRC, "libcaptionax_img.so"],
                           check=True, capture_output=True)
        except Exception:
            _LOAD_FAILED = True
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        _LOAD_FAILED = True
        return None
    u8p = np.ctypeslib.ndpointer(np.uint8)
    lib.cx_img_decode_resize.restype = ctypes.c_int
    lib.cx_img_decode_resize.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, u8p,
    ]
    lib.cx_img_probe.restype = ctypes.c_int
    lib.cx_img_probe.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.cx_img_decode.restype = ctypes.c_int
    lib.cx_img_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, u8p,
    ]
    lib.cx_img_decode_resize_batch.restype = ctypes.c_int
    lib.cx_img_decode_resize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        np.ctypeslib.ndpointer(np.int64), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p,
        np.ctypeslib.ndpointer(np.int32), ctypes.c_int,
    ]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def _pil_gray_u8(im) -> "np.ndarray":
    """PIL gray image -> uint8 with 16-bit values SCALED (not saturated:
    PIL's convert("L") clamps >255 to white; skimage and the native path
    scale by 255/65535, which we match)."""
    arr = np.asarray(im)
    if arr.dtype == np.uint8:
        return arr
    arr = arr.astype(np.uint32)
    return ((arr * 255 + 32767) // 65535).astype(np.uint8)


def _pil_to_rgb(im, gray_mode: int) -> "np.ndarray":
    """PIL image -> uint8 RGB with native-path semantics (viridis quirk
    on gray sources, scaled 16-bit, alpha dropped)."""
    if im.mode in ("L", "I;16", "I", "I;16B", "I;16L"):
        g = _pil_gray_u8(im)
        if gray_mode == GRAY_VIRIDIS:
            from captionax.data.transforms import grayscale_to_viridis

            return grayscale_to_viridis(g)
        return np.stack([g] * 3, axis=-1)
    return np.asarray(im.convert("RGB"), dtype=np.uint8)


def _pil_decode_resize(data: bytes, hw: Tuple[int, int],
                       gray_mode: int) -> np.ndarray:
    """Per-image fallback with identical semantics to the native path."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(data)) as im:
        im2 = Image.fromarray(_pil_to_rgb(im, gray_mode))
        return np.asarray(
            im2.resize((hw[1], hw[0]), Image.BILINEAR), dtype=np.uint8
        )


def decode_resize(data: bytes, hw: Tuple[int, int] = (224, 224),
                  gray_mode: int = GRAY_REPLICATE) -> np.ndarray:
    """bytes -> uint8 RGB [h, w, 3]; native path with PIL fallback."""
    lib = _load()
    if lib is not None:
        out = np.empty((hw[0], hw[1], 3), np.uint8)
        rc = lib.cx_img_decode_resize(data, len(data), hw[0], hw[1],
                                      gray_mode, out)
        if rc == 0:
            return out
    return _pil_decode_resize(data, hw, gray_mode)


def decode(data: bytes, gray_mode: int = GRAY_REPLICATE) -> np.ndarray:
    """bytes -> uint8 RGB [H, W, 3] at native size."""
    lib = _load()
    if lib is not None:
        h, w = ctypes.c_int(0), ctypes.c_int(0)
        if lib.cx_img_probe(data, len(data), ctypes.byref(h),
                            ctypes.byref(w)) == 0:
            out = np.empty((h.value, w.value, 3), np.uint8)
            if lib.cx_img_decode(data, len(data), gray_mode, out) == 0:
                return out
    import io

    from PIL import Image

    with Image.open(io.BytesIO(data)) as im:
        return _pil_to_rgb(im, gray_mode)


def decode_resize_batch(
    blobs: Sequence[bytes],
    hw: Tuple[int, int] = (224, 224),
    gray_mode: int = GRAY_REPLICATE,
    threads: int = 0,
) -> np.ndarray:
    """[bytes, ...] -> uint8 [B, h, w, 3] across the C++ thread pool.

    threads=0 uses one thread per available CPU (capped at 16).
    """
    lib = _load()
    B = len(blobs)
    out = np.zeros((B, hw[0], hw[1], 3), np.uint8)
    if B == 0:
        return out
    if lib is None:
        for i, b in enumerate(blobs):
            out[i] = _pil_decode_resize(b, hw, gray_mode)
        return out
    if threads <= 0:
        threads = min(os.cpu_count() or 1, 16)
    ptrs = (ctypes.c_char_p * B)(*blobs)
    lens = np.asarray([len(b) for b in blobs], np.int64)
    statuses = np.zeros((B,), np.int32)
    lib.cx_img_decode_resize_batch(ptrs, lens, B, hw[0], hw[1], gray_mode,
                                   out, statuses, threads)
    for i in np.nonzero(statuses < 0)[0]:
        out[i] = _pil_decode_resize(blobs[i], hw, gray_mode)
    return out


def make_file_loader(img_dir: str, hw: Tuple[int, int] = (224, 224),
                     gray_mode: int = GRAY_REPLICATE):
    """image_loader(name) for the dataset classes: reads img_dir/name and
    returns a decoded+resized uint8 [h, w, 3] (native path, PIL fallback),
    so the datasets' ragged-shape host_resize branch never triggers."""

    def load(name: str) -> np.ndarray:
        with open(os.path.join(img_dir, name), "rb") as f:
            return decode_resize(f.read(), hw, gray_mode)

    return load


def load_paths_batch(paths: List[str], hw: Tuple[int, int] = (224, 224),
                     gray_mode: int = GRAY_REPLICATE,
                     threads: int = 0) -> np.ndarray:
    """Read + decode + resize a list of files into one [B, h, w, 3]."""
    blobs = []
    for p in paths:
        with open(p, "rb") as f:
            blobs.append(f.read())
    return decode_resize_batch(blobs, hw, gray_mode, threads)
