"""Attribute the hypernet train-step cost: which pass owns the ~70-85 ms?

Variants (B=1024, T=25, reference dims, features precomputed) time the
semantically-nested pieces so marginal differences attribute cost:

  scan_fwd    teacher-forced scan only (attention+GRU recurrence, no fc/CE)
  fwd         full loss forward (scan + hoisted vocab GEMM + CE)
  scan_grad   grad of sum(hs) through the scan (recurrence fwd+bwd)
  full        value_and_grad + Adam update (the real train step)
  fc_ce       vocab GEMM + CE alone on a precomputed [B,T,H] (fwd)
  fc_ce_grad  same, fwd+bwd wrt hs and fc

`--bf16` applies the mixed-precision cast (as --bf16-compute does).

    python benchmarks/train_ablate.py [batch] [--bf16]
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

from captionax.models import decoder as dec
from captionax.models.hypernet import hypernet_apply, hypernet_init
from captionax.models.layers import embedding, linear
from captionax.train.losses import cross_entropy_loss
from captionax.train.state import create_train_state, make_optimizer
from captionax.train.steps import _tf_logits, make_hypernet_steps

NF, FO, E, H, V, R, T = 2048, 200, 200, 200, 9684, 49, 25


def timeit(fn, barrier, iters=8):
    barrier(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        barrier(fn())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def scan_only(decoder_params, features, captions, gru_params, bf16):
    """The teacher_forced recurrence without the fc GEMM (mirrors
    dec.teacher_forced's non-sampling path)."""
    if bf16:
        from captionax.train.steps import _bf16
        decoder_params = _bf16(decoder_params)
        gru_params = _bf16(gru_params)
        features = features.astype(jnp.bfloat16)
    feats = dec.encode_features(decoder_params, features)
    h0 = dec.init_hidden(decoder_params, feats)
    embeds = embedding(decoder_params["embed"], captions)
    B, Tn, En = embeds.shape
    zero_embed = jnp.zeros((B, En), embeds.dtype)
    from captionax.models.attention import bahdanau_attention
    from captionax.models.rnn import gru_cell

    def body(h, t):
        word = jnp.where(t == 0, zero_embed, embeds[:, jnp.maximum(t - 1, 0)])
        ctx, _ = bahdanau_attention(decoder_params["attention"], feats, h)
        h = gru_cell(gru_params, jnp.concatenate([word, ctx], -1), h)
        return h, h

    _, hs = jax.lax.scan(body, h0, jnp.arange(Tn))
    return hs.astype(jnp.float32)


def main(batch: int = 1024):
    bf16 = "--bf16" in sys.argv
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    params = {
        "decoder": dec.attention_gru_init(k1, NF, FO, E, H, V),
        "hn": hypernet_init(k2, hyper_emb=E, input_dim=E + FO, hidden_dim=H),
    }
    feats = jax.random.normal(k3, (batch, R, NF))
    caps = jax.random.randint(k4, (batch, T), 1, V)
    sid = jnp.asarray(4, jnp.int32)
    batch_d = {"features": feats, "captions": caps, "style_id": sid}
    out = {"batch": batch, "bf16": bf16}

    theta = jax.jit(
        lambda p: hypernet_apply(p["hn"], embedding(p["decoder"]["embed"], sid))
    )(params)

    # --- scan only, forward
    j_scan = jax.jit(lambda p, f, c, th: scan_only(p, f, c, th, bf16))
    out["scan_fwd_ms"] = timeit(
        lambda: j_scan(params["decoder"], feats, caps, theta),
        lambda x: np.asarray(x[0, 0, 0]),
    )

    # --- scan fwd+bwd (grad of mean(hs) wrt decoder+theta); arrays are
    # arguments, not closures — closed-over arrays bake into the jaxpr as
    # constants and blow past the remote-compile payload limit
    j_scan_g = jax.jit(
        jax.grad(
            lambda p, th, f, c: jnp.mean(scan_only(p, f, c, th, bf16))
        )
    )
    out["scan_grad_ms"] = timeit(
        lambda: j_scan_g(params["decoder"], theta, feats, caps),
        lambda x: np.asarray(x["fc"]["b"][0]),
    )

    # --- full loss forward (scan + vocab GEMM + CE)
    def loss_fn(p, b):
        th = hypernet_apply(p["hn"], embedding(p["decoder"]["embed"], sid))
        logits = _tf_logits(p["decoder"], b, gru_params=th, bf16=bf16)
        return cross_entropy_loss(logits, b["captions"], 0)

    j_fwd = jax.jit(loss_fn)
    out["fwd_ms"] = timeit(lambda: j_fwd(params, batch_d), lambda x: float(x))

    # --- fc GEMM + CE alone on precomputed hs
    hs = jnp.transpose(
        j_scan(params["decoder"], feats, caps, theta), (1, 0, 2)
    )

    def fc_ce(fc, hs, c):
        logits = linear(fc, hs).astype(jnp.float32)
        return cross_entropy_loss(logits, c, 0)

    j_fc = jax.jit(fc_ce)
    out["fc_ce_fwd_ms"] = timeit(
        lambda: j_fc(params["decoder"]["fc"], hs, caps), lambda x: float(x)
    )
    j_fc_g = jax.jit(jax.grad(fc_ce, argnums=(0, 1)))
    out["fc_ce_grad_ms"] = timeit(
        lambda: j_fc_g(params["decoder"]["fc"], hs, caps),
        lambda x: np.asarray(x[0]["b"][0]),
    )

    # --- the historical train step: unfused CE on [B,T,V] logits, no remat
    tx = make_optimizer(5e-3)
    from captionax.train.state import TrainState as _TS  # noqa: F401

    def unfused_step(state, b):
        def loss(p):
            th = hypernet_apply(p["hn"], embedding(p["decoder"]["embed"],
                                                   b["style_id"]))
            logits = _tf_logits(p["decoder"], b, gru_params=th, bf16=bf16)
            return cross_entropy_loss(logits, b["captions"], 0)

        l, grads = jax.value_and_grad(loss)(state.params)
        return state.apply_gradients(grads, tx), {"train_loss": l}

    state = create_train_state(params, tx)
    jstep = jax.jit(unfused_step, donate_argnums=())

    def one():
        nonlocal state
        state, m = jstep(state, batch_d)
        return m["train_loss"]

    out["step_unfused_ms"] = timeit(one, lambda x: float(x))

    # --- production step: fused chunked CE, with/without scan remat
    for label, remat in (("step_fused_ms", False),
                         ("step_fused_remat_ms", True)):
        train_step_r, _ = make_hypernet_steps(tx, bf16=bf16, remat=remat)
        state_r = create_train_state(params, tx)
        jstep_r = jax.jit(train_step_r, donate_argnums=())

        def one_r():
            nonlocal state_r
            state_r, m = jstep_r(state_r, batch_d)
            return m["train_loss"]

        out[label] = timeit(one_r, lambda x: float(x))

    for k in out:
        if k.endswith("_ms"):
            out[k] = round(out[k], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    nums = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(int(nums[0]) if nums else 1024)
