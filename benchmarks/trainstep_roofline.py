"""Roofline for the recurrent (hypernet attention-GRU) TRAIN step —
what fraction of the B=1024 bf16 train-only rate is compute roofline vs
bandwidth/latency — plus the att1-hoist A/B.

Design under test (train/steps.py): TF scan carries only the
recurrence; the vocab projection + CE run as one fused chunked GEMM
outside the scan (fused_ce_from_hidden); remat checkpoints the scan
body; att1 = W_a f is hoisted out of the scan (models/decoder.py —
the A/B here measures what the hoist buys over recomputing the
[B,R,F]x[F,H] GEMM in all T steps, which XLA's while-loop LICM cannot
do through the remat barrier).

Stages timed floor-free (device_time k-rep differencing):
- grad step (value_and_grad incl. theta synthesis, no optimizer)
- forward loss only
- scan only (recurrence without the vocab GEMM)
FLOP ledger gives MFU per stage; the gap between measured and
(FLOPs/peak) is latency/bandwidth, itemized against the 25-step
sequential-scan structure.

Usage: python benchmarks/trainstep_roofline.py [--bf16/--f32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from captionax.core.runtime import setup_runtime

setup_runtime()
import jax
import jax.numpy as jnp

from captionax.models import decoder as dec
from captionax.models.hypernet import hypernet_init
from captionax.train.losses import fused_ce_from_hidden
from captionax.train.steps import _bf16, synthesize_theta

NF, FO, E, H, V, R, B, T = 2048, 200, 200, 200, 9684, 49, 1024, 25
PEAK = 197.0  # v5e bf16 TFLOP/s


def flops_ledger():
    gemm = lambda m, k, n: 2 * m * k * n
    scan_step = (
        gemm(B, E + FO, 3 * H)       # gru gi
        + gemm(B, H, 3 * H)          # gru gh
        + gemm(B, H, H)              # U_a h
        + 2 * B * R * H              # v_a multiply-reduce (VPU-ish)
        + 2 * B * R * FO             # context weighted sum
    )
    fwd = {
        "encode_fc": gemm(B, NF, FO) + gemm(B, FO, FO),
        "att1_once": gemm(B * R, FO, H),
        "scan": T * scan_step,
        "vocab_ce": gemm(B * T, H, V),
        "att1_per_step_if_unhoisted": T * gemm(B * R, FO, H),
    }
    # backward multiplier for GEMMs ~2x (dX + dW); remat re-runs the scan
    total_fwd = sum(v for k, v in fwd.items()
                    if k != "att1_per_step_if_unhoisted")
    total_grad = 3 * total_fwd + fwd["scan"]  # + remat forward replay
    return fwd, total_fwd, total_grad


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--f32", action="store_true")
    p.add_argument("--fused-only", action="store_true",
                   help="measure ONLY the Pallas fused-recurrence train "
                        "step (ops/train_kernel.py) and write "
                        "trainstep_fused.json — run separately so a "
                        "relay-compile failure cannot cost the baseline "
                        "artifact")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "_parity", "trainstep_roofline.json"))
    args = p.parse_args(argv)
    bf16 = not args.f32

    k = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "decoder": dec.attention_gru_init(k[0], NF, FO, E, H, V),
        "hn": hypernet_init(k[1], hyper_emb=E, input_dim=E + FO,
                            hidden_dim=H),
    }
    feats = jax.random.normal(k[2], (B, R, NF))
    caps = jax.random.randint(jax.random.PRNGKey(3), (B, T), 0, V)
    sid = jnp.asarray(4, jnp.int32)

    def loss_fn(ps, f, hoist, fused=False):
        theta = synthesize_theta(ps, sid)
        dp, th, fx = ps["decoder"], theta, f
        if bf16:
            dp, th, fx = _bf16(dp), _bf16(th), f.astype(jnp.bfloat16)
        if fused:
            from captionax.ops.train_kernel import (
                fused_teacher_forced_hidden,
            )

            hs, _ = fused_teacher_forced_hidden(dp, fx, caps,
                                                gru_params=th)
        else:
            hs, _ = dec.teacher_forced_hidden(dp, fx, caps, gru_params=th,
                                              remat=True, hoist_att1=hoist)
        return fused_ce_from_hidden(dp["fc"], hs, caps)

    # timing: the train_throughput.py state-threading pattern — chain n
    # FULL optimizer steps inside one jit and difference k-rep vs 1-rep
    # walls (the feature-threaded value_and_grad chains used first
    # wedged the remote compile helper, like the fused mixup grad —
    # CLAUDE.md relay limits; this shape is known to compile)
    import optax
    import time as _time

    tx = optax.adam(5e-3)
    opt_state = tx.init(params)

    def make_step(hoist, fused=False):
        def step(ps, os_, f):
            loss, grads = jax.value_and_grad(
                lambda q: loss_fn(q, f, hoist, fused))(ps)
            updates, os2 = tx.update(grads, os_, ps)
            return optax.apply_updates(ps, updates), os2, loss
        return step

    def devtime(make_rep, iters=4, k=3):
        def wall(jfn):
            float(jfn())
            ts = []
            for _ in range(iters):
                t0 = _time.perf_counter()
                float(jfn())
                ts.append(_time.perf_counter() - t0)
            return min(ts)

        t1 = wall(make_rep(1))
        tk = wall(make_rep(k))
        return max(1e-9, (tk - t1) / (k - 1))

    def grad_rep(hoist, fused=False):
        step = make_step(hoist, fused)

        def make(n):
            @jax.jit
            def run(ps, os_, f):
                loss = None
                for _ in range(n):
                    ps, os_, loss = step(ps, os_, f)
                return loss
            return lambda: run(params, opt_state, feats)
        return make

    def fwd_rep(n):
        @jax.jit
        def run(ps, f):
            loss = jnp.float32(0)
            for _ in range(n):
                loss = loss + loss_fn(ps, f + loss * 1e-30, True)
            return loss
        return lambda: run(params, feats)

    def scan_rep(n):
        dp = _bf16(params["decoder"]) if bf16 else params["decoder"]

        @jax.jit
        def run(d, f):
            acc = jnp.float32(0)
            for _ in range(n):
                fx = (f + acc * 1e-30).astype(
                    jnp.bfloat16 if bf16 else jnp.float32)
                hs, _ = dec.teacher_forced_hidden(d, fx, caps, remat=True)
                acc = acc + jnp.sum(hs[:, -1, :2].astype(jnp.float32))
            return acc
        return lambda: run(dp, feats)

    if args.fused_only:
        res = {"bf16": bf16,
               "dims": {"B": B, "T": T, "V": V, "H": H, "R": R}}
        res["device_ms"] = {
            "grad_step_fused": devtime(grad_rep(True, fused=True)) * 1e3,
        }
        res["rates"] = {
            "img_per_s": B / (res["device_ms"]["grad_step_fused"] / 1e3),
        }
        out = os.path.join(os.path.dirname(args.out),
                           "trainstep_fused.json")
        with open(out, "w") as f:
            json.dump(res, f, indent=1)
        print(json.dumps(res, indent=1))
        return

    res = {"bf16": bf16, "dims": {"B": B, "T": T, "V": V, "H": H, "R": R}}
    res["device_ms"] = {
        "grad_step_hoisted": devtime(grad_rep(True)) * 1e3,
        "grad_step_unhoisted": devtime(grad_rep(False)) * 1e3,
        "forward_loss": devtime(fwd_rep, k=5) * 1e3,
        "scan_only_fwd": devtime(scan_rep, k=5) * 1e3,
    }
    fwd, total_fwd, total_grad = flops_ledger()
    g_ms = res["device_ms"]["grad_step_hoisted"]
    res["ledger_tflop"] = {k2: v / 1e12 for k2, v in fwd.items()}
    res["rates"] = {
        "img_per_s": B / (g_ms / 1e3),
        "grad_tflops": total_grad / (g_ms / 1e3) / 1e12,
        "grad_mfu_pct": total_grad / (g_ms / 1e3) / 1e12 / PEAK * 100,
        "fwd_tflops": total_fwd / (res["device_ms"]["forward_loss"] / 1e3)
        / 1e12,
        "scan_ms_per_step": res["device_ms"]["scan_only_fwd"] / T,
        "hoist_gain_ms": (res["device_ms"]["grad_step_unhoisted"]
                          - res["device_ms"]["grad_step_hoisted"]),
        "unhoisted_extra_tflop":
            2 * fwd["att1_per_step_if_unhoisted"] / 1e12,  # fwd+replay
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res["device_ms"], indent=1))
    print(json.dumps(res["rates"], indent=1))


if __name__ == "__main__":
    main()
