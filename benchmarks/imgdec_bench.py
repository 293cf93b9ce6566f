"""Host image pipeline: native C++ batch decoder vs the PIL path.

Measures decode+resize(224) throughput on synthetic JPEGs the size of
typical Flickr/CC photos (640x480).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import io
import time

import numpy as np
from PIL import Image

from captionax.data import native_image as ni


def main(n=256, hw=(480, 640)):
    rs = np.random.RandomState(0)
    blobs = []
    for i in range(n):
        arr = rs.randint(0, 256, (*hw, 3), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=90)
        blobs.append(buf.getvalue())

    t0 = time.perf_counter()
    for b in blobs:
        with Image.open(io.BytesIO(b)) as im:
            np.asarray(im.convert("RGB").resize((224, 224), Image.BILINEAR))
    t_pil = time.perf_counter() - t0

    out = ni.decode_resize_batch(blobs, (224, 224))  # warm (lib load)
    t0 = time.perf_counter()
    out = ni.decode_resize_batch(blobs, (224, 224))
    t_nat = time.perf_counter() - t0
    assert out.shape == (n, 224, 224, 3)

    t0 = time.perf_counter()
    out1 = ni.decode_resize_batch(blobs, (224, 224), threads=1)
    t_nat1 = time.perf_counter() - t0
    del out1

    print(f"PIL single-thread : {n/t_pil:8.0f} img/s")
    print(f"native 1 thread   : {n/t_nat1:8.0f} img/s ({t_pil/t_nat1:.2f}x)")
    print(f"native pooled     : {n/t_nat:8.0f} img/s ({t_pil/t_nat:.2f}x)")


if __name__ == "__main__":
    main()
