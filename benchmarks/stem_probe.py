"""Decompose the ResNet stem's cost into conv / epilogue / maxpool
parts.

RESOLVED (2026-08-18): the "stem burns 45 ms" reading was an artifact
of encoder_profile's cumulative-difference attribution (truncated jits
change XLA's layout choices) — floor-free k-rep timing
(`core.runtime.device_time`) measures the whole stem at **8.1 ms** at
B=1024, i.e. near its ~5 ms HBM floor.  No stem kernel is warranted.
Single-jit walls printed by this script each include the ~23-28 ms
relay dispatch floor; treat them as relative only.

Usage: python benchmarks/stem_probe.py [batch] [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from captionax.core.runtime import setup_runtime

setup_runtime()
import jax
import jax.numpy as jnp
import numpy as np

from captionax.models import encoder as enc


def timeit(fn, *args, iters=3):
    out = fn(*args)
    np.asarray(out.ravel()[:8])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out.ravel()[:8])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def conv_only(p, images, dtype=jnp.bfloat16):
    x = jnp.pad(images, ((0, 0), (3, 3), (3, 3), (0, 0)))
    return jax.lax.conv_general_dilated(
        x.astype(dtype), p["kernel"].astype(dtype), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_epilogue(p, images, dtype=jnp.bfloat16):
    y = conv_only(p, images, dtype)
    return jax.nn.relu(y * p["scale"].astype(dtype) + p["bias"].astype(dtype))


def pool_only(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def pool_shifts(x):
    """3x3/2 maxpool as 9 strided-slice maxes (no reduce_window)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=-jnp.inf)
    n_out = (x.shape[1] - 1) // 2 + 1
    lim = 2 * (n_out - 1) + 1
    out = None
    for dy in range(3):
        for dx in range(3):
            v = jax.lax.slice(
                xp, (0, dy, dx, 0),
                (xp.shape[0], dy + lim, dx + lim, xp.shape[3]),
                (1, 2, 2, 1))
            out = v if out is None else jnp.maximum(out, v)
    return out


def stem_bf16_images(p, images_bf16):
    return enc.resnet_stem(p, images_bf16)


def main(batch=1024, iters=3):
    params = enc.resnet_init(jax.random.PRNGKey(0), 152)
    p = params["stem"]
    images = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (batch, 224, 224, 3)))
    images_bf16 = jax.device_put(images.astype(jnp.bfloat16))

    rows = []

    def probe(name, fn, *args):
        t = timeit(jax.jit(fn), *args, iters=iters)
        rows.append((name, t * 1e3))
        print(f"{name:34s} {t*1e3:8.1f} ms", flush=True)

    probe("full stem (f32 in, bf16 compute)", enc.resnet_stem, p, images)
    probe("conv 7x7/2 only", conv_only, p, images)
    probe("conv + scale/bias/relu", conv_epilogue, p, images)
    probe("full stem (bf16 images in)", stem_bf16_images, p, images_bf16)

    y = jax.jit(conv_epilogue)(p, images)
    probe("maxpool only (reduce_window)", pool_only, y)
    probe("maxpool only (9 strided maxes)", pool_shifts, y)

    def stem_shift_pool(p, images):
        return pool_shifts(conv_epilogue(p, images))

    probe("stem with shift-maxpool", stem_shift_pool, p, images)


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    it = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    main(b, it)
