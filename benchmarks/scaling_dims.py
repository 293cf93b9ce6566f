"""Train-step MFU across model dims: is low MFU intrinsic to the
reference's size, not the framework?

The roofline note (benchmarks/README.md) attributes the hypernet train
step's ~7 TFLOP/s to 200-wide contraction axes.  This measures the SAME
step functions at a ladder of dims — the attention-GRU captioner step
(make_gru_steps) at 200 -> 1024, plus the hypernet step at its reference
dims and a BERT-base-shaped LaBERT grad step — reporting achieved FLOP/s
from XLA's own cost analysis (no hand FLOP model).

The hypernet itself cannot ladder: the reference head bucketing
(hypernet_attention.py:75-99) makes the big head's final linear
[w_size//M, w_size] with w_size = 3H(E+F), i.e. the head parameter
count grows ~quartically in the model dim (460 MB at dims 200, ~20 GB
at 512) — an architectural property worth stating, not a framework
limit; the GRU step it generates weights FOR is what scales.

    python benchmarks/scaling_dims.py                  # gru ladder + hn
    python benchmarks/scaling_dims.py --labert         # + labert rows
    python benchmarks/scaling_dims.py --dims 200,512 --batch 512

One JSON line per config.  v5e bf16 MXU peak ≈ 197 TFLOP/s (validated
at 98% by a 4096³ matmul chain — BASELINE.md).  Step times are
FLOOR-FREE on-device costs (k-steps-inside-one-jit differencing; a
single dispatch through the axon relay carries a ~23-34 ms floor that
would dominate these).
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
from captionax.models.hypernet import hypernet_init
from captionax.train.state import create_train_state, make_optimizer
from captionax.train.steps import make_gru_steps, make_hypernet_steps

PEAK_BF16 = 197e12


def steptime(step, state, batch, k=5, iters=4):
    """Floor-free per-step device seconds: chain k steps inside one jit
    (state threads through, so XLA cannot elide reps) and difference
    against the 1-step program — the ~23-34 ms relay dispatch floor
    cancels (see core.runtime.device_time)."""
    def rep(n):
        @jax.jit
        def run(s, b):
            loss = None
            for _ in range(n):
                s, m = step(s, b)
                loss = m["train_loss"]
            return loss
        return run

    def wall(jfn):
        float(jfn(state, batch))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(jfn(state, batch))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1 = wall(rep(1))
    tk = wall(rep(k))
    return max(1e-9, (tk - t1) / (k - 1))


def compiled_flops(jitted, *args):
    """XLA cost analysis of the compiled executable (flops per call)."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception:
        return float("nan")


def bench_step(d, vocab, batch, T, bf16, hypernet=False):
    nf = 2048
    k1, k2, k5 = jax.random.split(jax.random.PRNGKey(0), 3)
    decoder = dec.attention_gru_init(k1, nf, d, d, d, vocab)
    feats = jax.random.normal(k5, (batch, 49, nf), jnp.float32)
    caps = jax.random.randint(jax.random.PRNGKey(5), (batch, T), 1, vocab)
    batch_d = {"features": feats, "captions": caps}
    tx = make_optimizer(5e-3)
    if hypernet:
        params = {
            "decoder": decoder,
            "hn": hypernet_init(k2, hyper_emb=d, input_dim=2 * d,
                                hidden_dim=d),
        }
        batch_d["style_id"] = jnp.asarray(4, jnp.int32)
        step, _ = make_hypernet_steps(tx, bf16=bf16)
    else:
        params = decoder
        step, _ = make_gru_steps(tx, bf16=bf16)
    state = create_train_state(params, tx)
    flops = compiled_flops(jax.jit(step, donate_argnums=()), state, batch_d)
    t = steptime(step, state, batch_d)
    return t, flops


def bench_labert(hidden, layers, heads, vocab, batch, T, R=49):
    from captionax.models import labert

    params = labert.labert_init(
        jax.random.PRNGKey(0), vocab_size=vocab, hidden=hidden,
        num_layers=layers, num_heads=heads, intermediate=4 * hidden,
        num_regions=R, image_dim=2048,
    )
    kf, ki = jax.random.split(jax.random.PRNGKey(1))
    feats = jax.random.normal(kf, (batch, R, 2048))
    ids = jax.random.randint(ki, (batch, T), 0, vocab)
    types = jnp.zeros((batch, T), jnp.int32)
    rng = jax.random.PRNGKey(2)

    def loss(p):
        return labert.labert_loss(p, feats, ids, types, rng,
                                  mask_id=vocab - 1, num_heads=heads)

    vg = jax.value_and_grad(loss)
    flops = compiled_flops(jax.jit(vg), params)

    # params travel as the step STATE (closed-over 440 MB at h768 would
    # 413 the relay), with the loss threaded back in at 1e-30 so chained
    # reps cannot be CSE'd away
    def step(p, batch):
        lp, _ = jax.value_and_grad(
            lambda q: labert.labert_loss(q, batch, ids, types, rng,
                                         mask_id=vocab - 1,
                                         num_heads=heads))(p)
        p2 = jax.tree_util.tree_map(
            lambda a: a + lp.astype(a.dtype) * 1e-30, p)
        return p2, {"train_loss": lp}

    t = steptime(step, params, feats)
    return t, flops


def emit(row):
    print(json.dumps(row), flush=True)


def main(argv):
    dims = [int(x) for x in _flag(argv, "--dims", "200,512,1024").split(",")]
    batch = int(_flag(argv, "--batch", "1024"))
    T = int(_flag(argv, "--seq", "25"))
    bf16 = "--f32" not in argv
    peak = PEAK_BF16 if bf16 else PEAK_BF16 / 4

    for d in dims:
        for vocab in (9684, 32768) if "--wide-vocab" in argv else (9684,):
            t, flops = bench_step(d, vocab, batch, T, bf16)
            emit({
                "kind": "gru_step", "dims": d, "vocab": vocab,
                "batch": batch, "seq_len": T, "bf16": bf16,
                "step_ms": round(t * 1e3, 2),
                "images_per_sec": round(batch / t, 1),
                "xla_tflops_per_step": round(flops / 1e12, 3),
                "achieved_tflops": round(flops / t / 1e12, 2),
                "mfu_pct": round(100 * flops / t / peak, 1),
            })

    if "--no-hypernet" not in argv:
        t, flops = bench_step(200, 9684, batch, T, bf16, hypernet=True)
        emit({
            "kind": "hypernet_step", "dims": 200, "vocab": 9684,
            "batch": batch, "seq_len": T, "bf16": bf16,
            "step_ms": round(t * 1e3, 2),
            "images_per_sec": round(batch / t, 1),
            "xla_tflops_per_step": round(flops / 1e12, 3),
            "achieved_tflops": round(flops / t / 1e12, 2),
            "mfu_pct": round(100 * flops / t / peak, 1),
        })

    if "--labert" in argv:
        # f32 arrays, but jax's DEFAULT matmul precision on TPU feeds the
        # MXU bf16 operands (f32 accumulate), so the bf16 peak is the
        # honest roofline denominator here too.
        for hidden, layers, heads in ((256, 4, 8), (768, 12, 12)):
            t, flops = bench_labert(hidden, layers, heads, 9684,
                                    min(batch, 256), T)
            emit({
                "kind": "labert_grad_step", "hidden": hidden,
                "layers": layers, "batch": min(batch, 256), "seq_len": T,
                "step_ms": round(t * 1e3, 2),
                "xla_tflops_per_step": round(flops / 1e12, 3),
                "achieved_tflops": round(flops / t / 1e12, 2),
                "mfu_pct": round(100 * flops / t / PEAK_BF16, 1),
            })


def _flag(argv, name, default):
    return argv[argv.index(name) + 1] if name in argv else default


if __name__ == "__main__":
    main(sys.argv[1:])
