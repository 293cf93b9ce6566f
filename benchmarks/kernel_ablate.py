"""Attribute fused_beam_search per-step cost by ablating kernel stages.

Each variant skips one stage (semantically wrong, timing-only); the delta
vs the full kernel is that stage's share.  Timing barrier = device->host
fetch (block_until_ready is not a barrier under the axon relay).

Usage: python benchmarks/kernel_ablate.py [variant ...]
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

from captionax.models import decoder as dec
from captionax.models.hypernet import hypernet_init
from captionax.ops.decode_kernel import fused_beam_search
from captionax.train.steps import synthesize_theta

NF, FO, E, H, V, R, B = 2048, 200, 200, 200, 9684, 49, 1024
VARIANTS = ["", "noembed", "nocell", "notop3", "nomm", "nobook",
            "noembed,nocell,nomm,nobook"]


def main(variants):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "decoder": dec.attention_gru_init(k1, NF, FO, E, H, V),
        "hn": hypernet_init(k2, hyper_emb=E, input_dim=E + FO, hidden_dim=H),
    }
    features = jax.random.normal(k3, (B, R, NF))
    style_id = jnp.asarray(4, jnp.int32)
    base = None
    for ab in variants:
        @jax.jit
        def fn(p, f, s, ab=ab):
            theta = synthesize_theta(p, s)
            return fused_beam_search(p["decoder"], f, gru_params=theta,
                                     max_steps=50, ablate=ab).tokens
        out = fn(params, features, style_id)
        np.asarray(out[:2, :2])
        t0 = time.perf_counter()
        iters = 8
        for _ in range(iters):
            np.asarray(fn(params, features, style_id)[:2, :2])
        dt = (time.perf_counter() - t0) / iters
        if ab == "":
            base = dt
        name = ab or "full"
        extra = (f"  (stage share {1e3*(base-dt):+.1f} ms)"
                 if base is not None and ab else "")
        print(f"{name:<32} {dt*1e3:7.1f} ms  {B/dt:9,.0f} caps/s{extra}",
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or VARIANTS)
