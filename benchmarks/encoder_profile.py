"""Per-stage timing of the ResNet-152 encoder on the real TPU chip.

Times the stem and each residual stage cumulatively (difference = stage
cost) with the device->host barrier from captionax.core.runtime
(block_until_ready is not a completion barrier under the axon relay).

CAVEAT (2026-08-18): the cumulative-difference attribution is
approximate — each truncation is its own jit, so XLA picks different
layouts/fusions per truncation point and the marginals can shift cost
between adjacent stages (the stem marginal reads ~45 ms at B=1024 here
but measures 8.1 ms when timed floor-free in isolation with
`core.runtime.device_time`).  Trust this file for the coarse shape
(stage3 dominates at MXU peak); use device_time k-rep differencing for
per-stage truth.

Usage:  python benchmarks/encoder_profile.py [batch] [iters]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

from captionax.core.runtime import setup_runtime

setup_runtime()
import jax
import jax.numpy as jnp
import numpy as np

from captionax.models import encoder as enc


def truncated_apply(params, images, n_stages: int, compute_dtype=jnp.bfloat16):
    """resnet_apply cut after `n_stages` residual stages (0 = stem only)."""
    x = enc.resnet_stem(params["stem"], images, compute_dtype)
    for s, blocks in enumerate(params["stages"][:n_stages]):
        for b, block in enumerate(blocks):
            stride = 2 if (s > 0 and b == 0) else 1
            identity = x
            y = jax.nn.relu(enc._conv(x, block["conv1"], 1, compute_dtype))
            y = jax.nn.relu(enc._conv(y, block["conv2"], stride, compute_dtype))
            y = enc._conv(y, block["conv3"], 1, compute_dtype)
            if "downsample" in block:
                identity = enc._conv(x, block["downsample"], stride, compute_dtype)
            x = jax.nn.relu(y + identity)
    return x.astype(jnp.float32)


def timeit(fn, *args, iters=5):
    out = fn(*args)
    np.asarray(out.ravel()[:8])  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        np.asarray(out.ravel()[:8])  # device->host barrier
    return (time.perf_counter() - t0) / iters


def main(batch=256, iters=5, int8=False):
    params = enc.resnet_init(jax.random.PRNGKey(0), 152)
    images = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (batch, 224, 224, 3))
    )

    full = jax.jit(enc.resnet_apply)
    t_full = timeit(full, params, images, iters=iters)

    if int8:
        qfull = jax.jit(enc.resnet_apply_int8)
        # dynamic per-tensor activation scales: the max reduce is an
        # unfused memory pass per conv
        qdyn = enc.resnet_quantize(params)
        t_q = timeit(qfull, qdyn, images, iters=iters)
        print(f"int8-dynamic resnet152 B={batch}: {t_q*1e3:.1f} ms  "
              f"({batch/t_q:.0f} img/s, {t_full/t_q:.2f}x over bf16)")
        # calibrated static scales: quant/dequant is elementwise, fuses
        # into the conv epilogues
        scales = jax.jit(enc.resnet_calibrate)(params, images)
        qcal = enc.resnet_quantize(params, act_scales=scales)
        t_c = timeit(qfull, qcal, images, iters=iters)
        print(f"int8-calibrated resnet152 B={batch}: {t_c*1e3:.1f} ms  "
              f"({batch/t_c:.0f} img/s, {t_full/t_c:.2f}x over bf16)")
    print(f"full resnet152 B={batch}: {t_full*1e3:.1f} ms  "
          f"({batch/t_full:.0f} img/s)")

    prev = 0.0
    for n in range(0, 5):
        fn = jax.jit(lambda p, im, n=n: truncated_apply(p, im, n))
        t = timeit(fn, params, images, iters=iters)
        label = "stem" if n == 0 else f"stage{n}"
        print(f"  cumulative through {label}: {t*1e3:8.1f} ms   "
              f"(marginal {1e3*(t-prev):7.1f} ms)")
        prev = t

    # bf16 FLOP roofline from XLA's own cost analysis (the old hand
    # constant 11.6 GFLOP/img was torchvision's MAC count — half the
    # true FLOPs)
    try:
        cost = full.lower(params, images).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost["flops"])
    except Exception:
        flops = 23.2e9 * batch
    print(f"  roofline: {flops/1e12:.1f} TFLOP (XLA cost analysis); at "
          f"197 TFLOP/s peak -> {flops/197e12*1e3:.1f} ms ideal; MXU util ~ "
          f"{flops/197e12/t_full*100:.0f}%")


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--int8"]
    b = int(argv[0]) if len(argv) > 0 else 256
    it = int(argv[1]) if len(argv) > 1 else 5
    main(b, it, int8="--int8" in sys.argv)
