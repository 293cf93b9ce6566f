"""Quality parity for the NON-attention hypernet (BASELINE.json config
#2: "Hypernet-GRU stylized captioner", /root/reference/hypernet.py +
train_captioning.py) — the same protocol as benchmarks/parity_quality.py
applied to the original HyperNet architecture.

Semantics measured (both sides identically, from the SAME initial
weights on the SAME batch stream with the SAME teacher-forcing coin
flips):
- v0 hypernet: base E->4E->8E LeakyReLU (hypernet.py:55-60), bucketed
  heads over EVERY cell layer's tensors (num_layers=2, the reference
  __main__/CLI default — hypernet.py:209, train_captioning.py:61);
- DecoderGRU with uniform-random h0 every forward (later.py:393) and
  the layer(h, h) stacking quirk (later.py:412-414);
- t=0 consumes the projected image feature; TF feeds embed(caps[t-1]);
  no-TF feeds a multinomial sample of the previous softmax;
- mean CE over ALL positions (no ignore_index, hypernet.py:145);
- trained set = hn + captioner.embed + image_encoder.fc ONLY — fc_out
  frozen at init (configure_optimizers, hypernet.py:116-123);
- teacher_forcing_proba 1.0 -> x0.9995/step while > 0.25
  (hypernet.py:137-150);
- Adam (no grad clip — this trainer sets no gradient_clip_val) +
  ReduceLROnPlateau(cooldown=2, default factor=0.1) on val loss, where
  validation runs teacher_forcing=False (hypernet.py:153-174).

Features come from the shared frozen-trunk dump of parity_quality.py
(grid features mean-pooled to the 2048-d vector the reference's
resnet101 global pool produces); the trainable projection
Linear(2048, E) is part of both models.

Usage:
    python benchmarks/parity_captioning.py --phase all --epochs 12
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parity_quality import OUT_DIR, build_data, feature_path  # noqa: E402

STYLES = ("factual", "humour", "romantic")
# Architecture preserved exactly (base E->4E->8E, divisor-8 bucketing,
# num_layers=2, every quirk); dims HALVED from the reference __main__'s
# (200, 150).  Why: at canonical dims the v0 head stack is ~2.78e9
# params (~11.1 GB f32 — the w_ih head alone is Linear(11250, 90000) ~
# 1.03e9 params, hypernet.py:85-89), so params + Adam moments = 33 GB,
# which cannot fit the 16 GB v5e — nor the reference's own 2021-era GPU
# (a 40 GB A100 would need ~44 GB with grads); and this image's single
# host core would need ~10 h/side at f32 matvec bandwidth.  At
# E=100/H=75 the same architecture is ~350M params and both sides
# train in minutes; canonical-dims head shapes are unit-test-checked
# arithmetically (tests/test_hypernet_v0.py::test_canonical_head_dims).
E, H, LAYERS = 100, 75, 2


def pooled_features(n_images: int) -> np.ndarray:
    feats = np.load(feature_path(n_images)).astype(np.float32)
    return feats.mean(axis=1)  # [N, 49, 2048] grid -> resnet global pool


def tf_coin_stream(seed: int, n: int, decay: float, floor: float):
    """The exact reference TF schedule (hypernet.py:137-150) as a
    reproducible list of booleans shared by both sides."""
    rng = np.random.RandomState(seed + 991)
    p, out = 1.0, []
    for _ in range(n):
        out.append(bool(rng.binomial(1, p)))
        if p > floor:
            p *= decay
    return out, p


def batch_stream(data, idx, batch_size, seed, epoch):
    return data.batches(idx, batch_size, style="random", seed=seed + epoch,
                        with_images=False)


def eval_stream(data, idx, batch_size, style):
    return data.batches(idx, batch_size, style=style, seed=0, shuffle=False,
                        drop_remainder=False, with_images=False)


# -------------------------------------------------------------- jax side
def phase_jax(args):
    from captionax.core.runtime import setup_runtime

    setup_runtime()
    import jax

    # full-f32 matmuls: the hypernet heads EMIT the GRU weights, so the
    # TPU's default bf16-pass f32 dot precision perturbs theta itself
    # (measured: default precision trains unstably — loss rises after
    # epoch 0 — while the f32-matmul run tracks the torch-CPU oracle)
    jax.config.update("jax_default_matmul_precision", "highest")

    from captionax.cli.train_captioning import (
        build_capgru_model,
        capgru_loss,
        freeze_fc_out,
    )
    from captionax.models.cell_decoders import cell_decoder_infer
    from captionax.models.hypernet import hypernet_v0_apply
    from captionax.eval.metrics import CaptionMetrics
    from captionax.models.layers import embedding
    from captionax.train.state import (
        PlateauScheduler,
        create_train_state,
        get_lr,
        set_lr,
    )
    import optax

    vocab, data = build_data(args.images)
    feats_np = pooled_features(args.images)
    V = len(vocab)
    key = jax.random.PRNGKey(args.seed)
    params = build_capgru_model(key, E, H, V, cell="gru", num_layers=LAYERS)
    init_host = jax.tree_util.tree_map(np.asarray, params)
    with open(os.path.join(OUT_DIR, f"init_capgru{args.tag}.pkl"), "wb") as f:
        pickle.dump(init_host, f)

    # plain Adam, no clipping (hypernet.py:121 sets none)
    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.adam(learning_rate)
    )(learning_rate=args.lr)
    state = create_train_state(params, tx)
    plateau = PlateauScheduler(factor=0.1, cooldown=2)

    def make_step(teacher_forcing):
        @jax.jit
        def step(state, feats, caps, style_id, rng):
            loss, grads = jax.value_and_grad(capgru_loss)(
                state.params, feats, caps, style_id, rng,
                cell="gru", teacher_forcing=teacher_forcing, pad_id=None)
            if not args.train_fc_out:
                grads = freeze_fc_out(grads)
            return state.apply_gradients(grads, tx), loss

        return step

    step_fns = {True: make_step(True), False: make_step(False)}

    @jax.jit
    def val_loss_fn(params, feats, caps, style_id, rng):
        # validation_step: teacher_forcing=False (hypernet.py:163)
        return capgru_loss(params, feats, caps, style_id, rng,
                           cell="gru", teacher_forcing=False, pad_id=None)

    train_idx, val_idx, test_idx = data.splits(seed=args.seed)
    steps_per_epoch = len(train_idx) // args.batch_size
    coins, p_final = tf_coin_stream(args.seed, steps_per_epoch * args.epochs,
                                    args.tf_decay, args.tf_floor)
    history = {}
    t0 = time.time()
    gstep = 0
    for epoch in range(args.epochs):
        ep_loss, n = 0.0, 0
        for b in batch_stream(data, train_idx, args.batch_size, args.seed,
                              epoch):
            f = feats_np[b["indices"]]
            state, loss = step_fns[coins[gstep]](
                state, f, b["captions"], b["style_id"],
                jax.random.PRNGKey(gstep))
            ep_loss += float(loss)
            n += 1
            gstep += 1
        vl, vn = 0.0, 0
        for b in eval_stream(data, val_idx, args.batch_size, "random"):
            f = feats_np[b["indices"]]
            vl += float(val_loss_fn(state.params, f, b["captions"],
                                    b["style_id"],
                                    jax.random.PRNGKey(10_000_000 + vn)))
            vn += 1
        vl /= max(vn, 1)
        new_lr = plateau.step(vl, get_lr(state))
        if new_lr != get_lr(state):
            state = set_lr(state, new_lr)
        history[epoch] = {"train_loss": ep_loss / max(n, 1), "val_loss": vl,
                          "lr": get_lr(state)}
        print(f"jax epoch {epoch}: train {ep_loss / max(n, 1):.4f} "
              f"val_notf {vl:.4f} ({time.time() - t0:.0f}s)", flush=True)
    results = {"history": history, "train_seconds": time.time() - t0,
               "p_tf_final": p_final}

    # ---- eval: TF CE/CIDEr + greedy CIDEr per style
    trained = state.params

    @jax.jit
    def tf_logits(params, feats, caps, style_id, rng):
        feat = feats @ params["proj"]["w"] + params["proj"]["b"]
        thetas = hypernet_v0_apply(
            params["hn"], embedding(params["decoder"]["embed"], style_id))
        from captionax.models.cell_decoders import cell_decoder_forward

        return cell_decoder_forward(params["decoder"], feat, caps,
                                    cell="gru", teacher_forcing=True,
                                    rng=rng, cell_params=thetas,
                                    random_h0=True)

    @jax.jit
    def greedy_ids(params, feats, style_id, rng):
        feat = feats @ params["proj"]["w"] + params["proj"]["b"]
        thetas = hypernet_v0_apply(
            params["hn"], embedding(params["decoder"]["embed"], style_id))
        return cell_decoder_infer(params["decoder"], feat,
                                  max_len=args.greedy_len, cell="gru",
                                  cell_params=thetas, random_h0=True,
                                  rng=rng)

    for st in STYLES:
        tf_q, greedy_q = CaptionMetrics(vocab), CaptionMetrics(vocab)
        i = 0
        for b in eval_stream(data, test_idx, args.batch_size, st):
            f = feats_np[b["indices"]]
            logits = tf_logits(trained, f, b["captions"], b["style_id"],
                               jax.random.PRNGKey(20_000_000 + i))
            tf_q.add_batch_logits(np.asarray(b["captions"]),
                                  np.asarray(logits))
            ids = greedy_ids(trained, f, b["style_id"],
                             jax.random.PRNGKey(30_000_000 + i))
            greedy_q.add_batch_ids(np.asarray(b["captions"]),
                                   np.asarray(ids))
            i += 1
        res = {f"tf_{k}": float(v) for k, v in tf_q.compute().items()}
        res.update({f"greedy_{k}": float(v)
                    for k, v in greedy_q.compute().items()})
        results[f"test_{st}"] = res
        print(st, {k: round(v, 4) for k, v in res.items()
                   if "cider" in k or "bleu1" in k}, flush=True)
    final_host = jax.tree_util.tree_map(np.asarray, trained)
    with open(os.path.join(OUT_DIR, f"trained_capgru_jax{args.tag}.pkl"),
              "wb") as f:
        pickle.dump(final_host, f)
    with open(os.path.join(OUT_DIR, f"capgru_jax{args.tag}.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("jax done", results["train_seconds"], "s")


# ------------------------------------------------------------ torch side
class TorchV0:
    """Raw-torch rebuild of the reference HyperNet (hypernet.py:26-123)
    initialized from the captionax pytree: base + per-layer bucketed
    heads + embed + frozen fc_out + trainable projection.
    ``train_fc=True`` is the deviation pair of the jax side's
    --train-fc-out (fc_out joins the optimizer)."""

    def __init__(self, init, train_fc=False):
        self.train_fc = train_fc
        import torch

        def from_mlp(p):
            lins = []
            for i in range(len(p)):
                w = np.asarray(p[f"l{i}"]["w"])
                lin = torch.nn.Linear(w.shape[0], w.shape[1])
                lin.weight.data = torch.from_numpy(w.T.copy())
                lin.bias.data = torch.from_numpy(
                    np.asarray(p[f"l{i}"]["b"]).copy())
                lins.append(lin)
            return torch.nn.ModuleList(lins)

        self.base = from_mlp(init["hn"]["base"])
        self.layers = [
            {name: from_mlp(heads[name]) for name in heads}
            for heads in init["hn"]["layers"]
        ]
        self.embed = torch.nn.Embedding(*np.asarray(
            init["decoder"]["embed"]).shape)
        self.embed.weight.data = torch.from_numpy(
            np.asarray(init["decoder"]["embed"]).copy())
        pw = np.asarray(init["proj"]["w"])
        self.proj = torch.nn.Linear(pw.shape[0], pw.shape[1])
        self.proj.weight.data = torch.from_numpy(pw.T.copy())
        self.proj.bias.data = torch.from_numpy(
            np.asarray(init["proj"]["b"]).copy())
        fw = np.asarray(init["decoder"]["fc_out"]["w"])  # [H, V]
        self.fc = torch.nn.Linear(fw.shape[0], fw.shape[1])
        self.fc.weight.data = torch.from_numpy(fw.T.copy())
        self.fc.bias.data = torch.from_numpy(
            np.asarray(init["decoder"]["fc_out"]["b"]).copy())
        self.fc_w = self.fc.weight.data.T  # kept views for readers
        self.fc_b = self.fc.bias.data

    def trainable(self):
        ps = [p for lin in self.base for p in lin.parameters()]
        for heads in self.layers:
            for mlps in heads.values():
                ps.extend(p for lin in mlps for p in lin.parameters())
        ps.extend(self.embed.parameters())
        ps.extend(self.proj.parameters())
        if self.train_fc:  # deviation pair of --train-fc-out
            ps.extend(self.fc.parameters())
        return ps  # fc_out absent by default (hypernet.py:116-123)

    def thetas(self, style_embed):
        import torch.nn.functional as TF

        x = style_embed
        for lin in self.base:
            x = TF.leaky_relu(lin(x))
        out = []
        for heads in self.layers:
            flat = {}
            for name, mlps in heads.items():
                y = x
                for i, lin in enumerate(mlps):
                    y = lin(y)
                    if i < len(mlps) - 1:
                        y = TF.leaky_relu(y)
                flat[name] = y
            g = flat["b_ih"].shape[-1]
            out.append({"w_ih": flat["w_ih"].reshape(g, -1),
                        "w_hh": flat["w_hh"].reshape(g, -1),
                        "b_ih": flat["b_ih"], "b_hh": flat["b_hh"]})
        return out


def functional_gru(theta, x, h):
    import torch

    gi = x @ theta["w_ih"].T + theta["b_ih"]
    gh = h @ theta["w_hh"].T + theta["b_hh"]
    i_r, i_z, i_n = gi.chunk(3, 1)
    h_r, h_z, h_n = gh.chunk(3, 1)
    r = torch.sigmoid(i_r + h_r)
    z = torch.sigmoid(i_z + h_z)
    n = torch.tanh(i_n + r * h_n)
    return (1 - z) * n + z * h


def torch_forward(m, thetas, feats2048, caps, teacher_forcing):
    """DecoderGRU.forward (later.py:389-457): random h0, t=0 feature,
    TF embed(caps[t-1]) / no-TF multinomial of prev softmax, the
    layer(h, h) stacking quirk."""
    import torch

    B, T = caps.shape
    feat = m.proj(feats2048)
    h = torch.rand(B, H)
    embeds = m.embed(caps)
    outs = []
    out = None
    for t in range(T):
        if t == 0:
            x = feat
        elif teacher_forcing:
            x = embeds[:, t - 1]
        else:
            pred = torch.softmax(out, dim=1)
            x = m.embed(torch.multinomial(pred, 1).t()[0])
        h = functional_gru(thetas[0], x, h)
        for th in thetas[1:]:
            h = functional_gru(th, h, h)
        out = m.fc(h)
        outs.append(out)
    return torch.stack(outs, 1)


def torch_greedy(m, thetas, feats2048, max_len):
    """DecoderGRU.infer (later.py:459-490): random h0, argmax feedback,
    runs the full horizon (no early stop)."""
    import torch

    with torch.no_grad():
        feat = m.proj(feats2048)
        B = feat.shape[0]
        h = torch.rand(B, H)
        out = None
        toks = []
        for t in range(max_len):
            x = feat if t == 0 else m.embed(out.argmax(dim=1))
            h = functional_gru(thetas[0], x, h)
            for th in thetas[1:]:
                h = functional_gru(th, h, h)
            out = m.fc(h)
            toks.append(out.argmax(dim=1))
        return torch.stack(toks, 1).numpy()


def phase_torch(args):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch

    from captionax.eval.metrics import CaptionMetrics

    vocab, data = build_data(args.images)
    feats_np = pooled_features(args.images)
    with open(os.path.join(OUT_DIR, f"init_capgru{args.tag}.pkl"), "rb") as f:
        init = pickle.load(f)
    torch.manual_seed(args.seed)
    m = TorchV0(init, train_fc=args.train_fc_out)
    opt = torch.optim.Adam(m.trainable(), lr=args.lr)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, cooldown=2)

    train_idx, val_idx, test_idx = data.splits(seed=args.seed)
    steps_per_epoch = len(train_idx) // args.batch_size
    coins, _ = tf_coin_stream(args.seed, steps_per_epoch * args.epochs,
                              args.tf_decay, args.tf_floor)

    def loss_of(b, teacher_forcing):
        feats = torch.from_numpy(feats_np[b["indices"]])
        caps = torch.from_numpy(b["captions"]).long()
        sid = torch.tensor(int(b["style_id"]))
        thetas = m.thetas(m.embed(sid))
        logits = torch_forward(m, thetas, feats, caps, teacher_forcing)
        return torch.nn.functional.cross_entropy(
            logits.view(-1, logits.shape[-1]), caps.view(-1))

    history = {}
    t0 = time.time()
    gstep = 0
    for epoch in range(args.epochs):
        ep_loss, n = 0.0, 0
        for b in batch_stream(data, train_idx, args.batch_size, args.seed,
                              epoch):
            loss = loss_of(b, coins[gstep])
            opt.zero_grad()
            loss.backward()
            opt.step()
            ep_loss += float(loss.detach())
            n += 1
            gstep += 1
        with torch.no_grad():
            vl, vn = 0.0, 0
            for b in eval_stream(data, val_idx, args.batch_size, "random"):
                vl += float(loss_of(b, False))
                vn += 1
        vl /= max(vn, 1)
        sched.step(vl)
        history[epoch] = {"train_loss": ep_loss / max(n, 1), "val_loss": vl,
                          "lr": opt.param_groups[0]["lr"]}
        print(f"torch epoch {epoch}: train {ep_loss / max(n, 1):.4f} "
              f"val_notf {vl:.4f} ({time.time() - t0:.0f}s)", flush=True)
    results = {"history": history, "train_seconds": time.time() - t0}

    for st in STYLES:
        tf_q, greedy_q = CaptionMetrics(vocab), CaptionMetrics(vocab)
        with torch.no_grad():
            for b in eval_stream(data, test_idx, args.batch_size, st):
                feats = torch.from_numpy(feats_np[b["indices"]])
                caps = torch.from_numpy(b["captions"]).long()
                sid = torch.tensor(int(b["style_id"]))
                thetas = m.thetas(m.embed(sid))
                logits = torch_forward(m, thetas, feats, caps, True)
                tf_q.add_batch_logits(caps.numpy(), logits.numpy())
                ids = torch_greedy(m, thetas, feats, args.greedy_len)
                greedy_q.add_batch_ids(caps.numpy(), ids)
        res = {f"tf_{k}": float(v) for k, v in tf_q.compute().items()}
        res.update({f"greedy_{k}": float(v)
                    for k, v in greedy_q.compute().items()})
        results[f"test_{st}"] = res
        print(st, {k: round(v, 4) for k, v in res.items()
                   if "cider" in k or "bleu1" in k}, flush=True)
    with open(os.path.join(OUT_DIR, f"capgru_torch{args.tag}.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("torch done")


def phase_report(args):
    rows = {}
    for side in ("jax", "torch"):
        path = os.path.join(OUT_DIR, f"capgru_{side}{args.tag}.json")
        if os.path.exists(path):
            with open(path) as f:
                rows[side] = json.load(f)
    print("== parity report: capgru (non-attention hypernet) ==")
    worst = 0.0
    for st in STYLES:
        for metric in ("tf_cider", "tf_bleu1", "greedy_cider"):
            vals = {s: r.get(f"test_{st}", {}).get(metric)
                    for s, r in rows.items()}
            if all(v is not None for v in vals.values()) and len(vals) == 2:
                d = vals["jax"] - vals["torch"]
                worst = max(worst, abs(d))
                print(f"{st:9s} {metric:14s} jax={vals['jax']:.4f} "
                      f"torch={vals['torch']:.4f} delta={d:+.4f}")
    print(f"worst |delta| = {worst:.4f} (north-star band: 0.5)")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", type=int, default=2000)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tag", type=str, default="")
    p.add_argument("--tf-decay", type=float, default=0.9995)
    p.add_argument("--tf-floor", type=float, default=0.25)
    p.add_argument("--greedy-len", type=int, default=20)
    p.add_argument("--train-fc-out", action="store_true",
                   help="deviation pair: BOTH sides put fc_out in the "
                        "optimizer (the reference freezes it at random "
                        "init — measured degenerate, CIDEr ~0 on both "
                        "frameworks; this pair measures parity in the "
                        "non-degenerate regime)")
    p.add_argument("--phase", default="all",
                   choices=["all", "jax", "torch", "report"])
    p.add_argument("--platform", default="default",
                   choices=["default", "cpu"])
    args = p.parse_args(argv)
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    os.makedirs(OUT_DIR, exist_ok=True)
    if not os.path.exists(feature_path(args.images)):
        raise SystemExit(
            f"missing {feature_path(args.images)} — run "
            f"parity_quality.py --phase dump --images {args.images} first")
    for ph in (["jax", "torch", "report"] if args.phase == "all"
               else [args.phase]):
        globals()[f"phase_{ph}"](args)


if __name__ == "__main__":
    main()
