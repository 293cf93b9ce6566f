"""Measure training-step throughput at reference dims on the TPU.

Times are FLOOR-FREE on-device costs (k-reps-inside-one-jit
differencing; a single dispatch through the axon relay carries a
~23-34 ms floor).  Earlier recorded runs (BASELINE.md 2026-08-16/17)
were single-dispatch walls and include one floor per stage.

Two stages, reported separately and combined:
- encoder: frozen ResNet-152 over 224x224 images (bf16) -> [B,49,2048];
- hypernet train step: style -> theta synthesis + teacher-forced CE +
  Adam update over hypernet + shared decoder params.

    python benchmarks/train_throughput.py [batch]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from captionax.core.runtime import setup_runtime

setup_runtime()

import jax
import jax.numpy as jnp

from captionax.data.transforms import preprocess_images
from captionax.models import decoder as dec
from captionax.models.encoder import encoder_cnn, resnet_init
from captionax.models.hypernet import hypernet_init
from captionax.train.state import create_train_state, make_optimizer
from captionax.train.steps import make_hypernet_steps

NF, FO, E, H, V, R, T = 2048, 200, 200, 200, 9684, 49, 25


def devtime(make_rep, iters=5, k=5):
    """Floor-free device seconds per rep: k-reps-inside-one-jit minus
    1-rep (the ~23-34 ms relay dispatch floor cancels; see
    core.runtime.device_time)."""
    def wall(jfn):
        float(jfn())
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(jfn())
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1 = wall(make_rep(1))
    tk = wall(make_rep(k))
    return max(1e-9, (tk - t1) / (k - 1))


def main(batch: int = 256):
    k = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    params = {
        "decoder": dec.attention_gru_init(k1, NF, FO, E, H, V),
        "hn": hypernet_init(k2, hyper_emb=E, input_dim=E + FO, hidden_dim=H),
    }
    enc = resnet_init(k3, 152)
    images = jax.random.randint(k4, (batch, 224, 224, 3), 0, 255, jnp.uint8)

    encode = jax.jit(lambda imgs: encoder_cnn(enc, preprocess_images(imgs)))

    def enc_rep(n):
        # big arrays as ARGUMENTS (closed-over constants 413 the relay)
        @jax.jit
        def run(e, imgs):
            out = None
            for _ in range(n):
                out = encoder_cnn(e, preprocess_images(imgs))
                # thread a data dependency so XLA can't elide reps
                imgs = (imgs + out[0, 0, 0].astype(jnp.uint8)[None, None,
                                                              None, None])
            return out[0, 0, 0]
        return lambda: run(enc, images)

    t_enc = devtime(enc_rep)

    feats = encode(images)
    caps = jax.random.randint(jax.random.PRNGKey(5), (batch, T), 1, V)
    batch_d = {"features": feats, "captions": caps,
               "style_id": jnp.asarray(4, jnp.int32)}
    tx = make_optimizer(5e-3)
    bf16 = "--bf16" in sys.argv or "--bf16-compute" in sys.argv
    train_step, _ = make_hypernet_steps(tx, bf16=bf16)
    state = create_train_state(params, tx)
    def step_rep(n):
        @jax.jit
        def run(s, b):
            loss = None
            for _ in range(n):
                s, m = train_step(s, b)
                loss = m["train_loss"]
            return loss
        return lambda: run(state, batch_d)

    t_step = devtime(step_rep)

    print(json.dumps({
        "metric": "hypernet_train_images_per_sec_per_chip",
        "encoder_ms": round(t_enc * 1e3, 2),
        "train_step_ms": round(t_step * 1e3, 2),
        "combined_images_per_sec": round(batch / (t_enc + t_step), 1),
        # with --cache-features (train/harness.py FeatureCache) the
        # frozen encoder runs once per image, so steady-state epochs run
        # at the train-only rate
        "cached_features_images_per_sec": round(batch / t_step, 1),
        "train_only_images_per_sec": round(batch / t_step, 1),
        "batch": batch,
        "seq_len": T,
        "bf16_compute": bf16,
    }))


if __name__ == "__main__":
    nums = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(int(nums[0]) if nums else 256)
