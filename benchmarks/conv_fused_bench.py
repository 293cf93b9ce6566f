"""Fused-bottleneck Pallas kernel vs XLA convs on the real chip.

Benchmarks `ops.conv_kernel.fused_stage` against the stock
`encoder.resnet_apply` conv chain for the narrow-channel stages and
checks numeric agreement on-device.  Times are FLOOR-FREE on-device
costs via `core.runtime.device_time` (a single-dispatch wall through
the axon relay carries a ~23-28 ms floor that would swamp these).

Measured verdict (2026-08-18, B=256): XLA wins — stage1 22.3 µs/img
XLA vs 24.8 fused; stage2 26.3 vs 42.4.  See ops/conv_kernel.py.

Usage: python benchmarks/conv_fused_bench.py [batch] [iters]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from captionax.core.runtime import setup_runtime

setup_runtime()
import jax
import jax.numpy as jnp
import numpy as np

from captionax.core.runtime import device_time
from captionax.models import encoder as enc
from captionax.ops.conv_kernel import fused_stage, pack_stage


def xla_chain(blocks, x, dtype=jnp.bfloat16):
    for block in blocks:
        identity = x
        y = jax.nn.relu(enc._conv(x, block["conv1"], 1, dtype))
        y = jax.nn.relu(enc._conv(y, block["conv2"], 1, dtype))
        y = enc._conv(y, block["conv3"], 1, dtype)
        if "downsample" in block:
            identity = enc._conv(x, block["downsample"], 1, dtype)
        x = jax.nn.relu(y + identity)
    return x


def run(name, blocks, x, iters, nb_list, chain_slice):
    B = x.shape[0]
    cin = x.shape[3]
    t_ref = device_time(
        lambda v: xla_chain(blocks, v)[..., :cin], x, iters=iters)
    print(f"{name}: XLA chain {t_ref*1e3:8.2f} ms device "
          f"({t_ref/B*1e6:.1f} us/img)", flush=True)
    packed = pack_stage(blocks)
    ref = np.asarray(jax.jit(lambda v: xla_chain(blocks, v))(x), np.float32)
    scale = np.abs(ref).max()
    for nb in nb_list:
        try:
            t = device_time(
                lambda v: fused_stage(v, packed, block_images=nb)
                [..., :cin].astype(jnp.bfloat16), x, iters=iters)
            got = np.asarray(
                jax.jit(lambda v: fused_stage(v, packed, block_images=nb))(x),
                np.float32)
            err = np.abs(ref - got).max()
            print(f"{name}: fused nb={nb}  {t*1e3:8.2f} ms device "
                  f"({t/B*1e6:.1f} us/img, {t_ref/max(t,1e-9):.2f}x)  "
                  f"max_err {err:.4f} (scale {scale:.2f})", flush=True)
        except Exception as e:
            print(f"{name}: fused nb={nb}  FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


def main(batch=256, iters=5):
    params = enc.resnet_init(jax.random.PRNGKey(0), 152)
    k = jax.random.PRNGKey(1)

    x1 = jax.random.normal(k, (batch, 56, 56, 64), jnp.float32) \
        .astype(jnp.bfloat16)
    run("stage1 (3 blocks, w/ proj)", params["stages"][0], x1, iters,
        (1,), 64)

    x2 = jax.random.normal(k, (batch, 28, 28, 512), jnp.float32) \
        .astype(jnp.bfloat16)
    run("stage2 blocks1-7 (identity)", params["stages"][1][1:], x2, iters,
        (1,), 512)


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    it = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    main(b, it)
