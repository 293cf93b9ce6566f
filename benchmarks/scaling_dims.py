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

One JSON line per config.  v5e bf16 MXU peak ≈ 197 TFLOP/s (f32 ≈ 1/4).
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


def timeit(fn, barrier, iters=6):
    barrier(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        barrier(fn())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


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
    jstep = jax.jit(step, donate_argnums=())
    flops = compiled_flops(jstep, state, batch_d)

    def one():
        nonlocal state
        state, m = jstep(state, batch_d)
        return m["train_loss"]

    t = timeit(one, lambda x: float(x))
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

    vg = jax.jit(jax.value_and_grad(loss))
    flops = compiled_flops(vg, params)

    def one():
        lp, _ = vg(params)
        return lp

    t = timeit(one, lambda x: float(x))
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
