"""Fused Pallas TPU decode kernels: the whole autoregressive loop in one
kernel launch, weights resident in VMEM.

Why (the BASELINE.json north star): the scan-based decoder re-reads the
vocab projection (7.7 MB f32) and embedding table from HBM on every one of
the 50 steps and round-trips [B*k, V] logits (~29 MB f32 at B=256) through
HBM per step — ~1.5 ms/step, entirely bandwidth-bound.  Here the
embedding table, vocab projection, attention weights, and the
hypernet-emitted GRU theta are loaded into VMEM **once** (~9 MB in
bfloat16), and all 50 steps of embed -> Bahdanau attention -> GRU ->
logits -> (arg)max/beam-update run on-chip; logits never touch HBM.

Kernel family:
- :func:`fused_greedy`       — batched greedy decode;
- :func:`fused_beam_search`  — batched k=3 beam with the reference
  test_step semantics (zeroed step-1 embedding, beam-0-only first
  expansion, completed-beam retirement, raw-score winner).

Implementation notes (see /opt/skills/guides/pallas_guide.md):
- embedding gather and beam-reindex permutations are expressed as one-hot
  matmuls — MXU-friendly and layout-trivial, unlike row gathers;
- ``att1 = W_a @ features`` is precomputed outside the kernel (features
  are constant across decode steps);
- the vocab axis is padded to a multiple of 128 with -1e9 logit bias so
  padded entries never win;
- top-3 per beam row is three rounds of (max, first-argmax-via-iota,
  mask); the per-image top-3 over the 9 beam-candidates reuses the same
  trick on a [tile, 9] matrix — no per-image loops over V.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from captionax.models import decoder as dec

NEG_INF = -1e9


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _first_argmax(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Index of the first maximum along ``axis`` (iota trick, TPU-safe)."""
    n = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    is_max = x == jnp.max(x, axis=axis, keepdims=True)
    return jnp.min(jnp.where(is_max, idx, n), axis=axis)


def _top3(x: jnp.ndarray, seg: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row top-3 (values, indices) of [N, M] in descending order,
    matching jax.lax.top_k exactly (first-occurrence order under ties).

    The flat masking scheme is the default everywhere: the r5
    same-session floor-free A/B (benchmarks/_parity/
    decode_roofline_seg.json) measured flat 36.6 ms vs segmented
    38.0 ms for the full kernel at production dims, refuting the r4
    pass-count analysis — the segmented scheme cuts full-width
    elementwise passes ~4.5x (~18 -> ~4) yet runs ~4% SLOWER, because
    its per-round select chain issues S=19 narrow [rows, 128] VPU ops
    where the flat scheme issues few wide [rows, 2432] ones: the stage
    is VPU issue/occupancy-bound at these row counts, not
    pass-throughput-bound.  ``seg=True`` (profiling-only,
    ablate='segtop3') keeps the segmented scheme selectable for the
    A/B; semantics of the two are bit-identical (first-occurrence tie
    order), enforced by the scan-vs-kernel equality tests."""
    if seg and x.shape[1] >= 512 and x.shape[1] % 128 == 0:
        return _top3_seg(x)
    return _top3_flat(x)


def _top3_flat(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """3 rounds of max -> first-argmax-via-iota -> mask, sharing the max
    between value and argmax (one VPU reduction fewer per round than a
    naive max + argmax pair).  ~6 elementwise passes over [N, M] per
    round."""
    vals, idxs = [], []
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    M = x.shape[1]
    for _ in range(3):
        v = jnp.max(x, axis=1)
        is_max = x >= v[:, None]
        i = jnp.min(jnp.where(is_max, cols, M), axis=1)
        vals.append(v)
        idxs.append(i)
        x = jnp.where(cols == i[:, None], NEG_INF, x)
    return jnp.stack(vals, 1), jnp.stack(idxs, 1)  # [N, 3]


def _top3_seg(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Segmented top-3: one pass computes per-128-lane-segment maxes,
    then each round runs on [N, S] segment maxes (tiny) plus ONE
    select-chain pass over the full width to extract the winning
    segment; argmax/masking happen inside 128 lanes.  ~(1 + 3) full-
    width passes total vs ~18 for the flat scheme — the top-3 stage was
    the kernel's dominant VPU cost (14.5 ms of the 36.7 ms call,
    benchmarks/_parity/decode_roofline.json).

    Semantics are bit-identical to _top3_flat: the global first-max lane
    is the first lane of the first segment attaining the global max
    (segment maxes and extracted values are the same f32 bits), and
    prior picks are re-masked after extraction, so first-occurrence tie
    order is preserved."""
    rows, c = x.shape
    S = c // 128
    cols = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    segs = [x[:, s * 128:(s + 1) * 128] for s in range(S)]
    m = jnp.concatenate(
        [jnp.max(sg, axis=1)[:, None] for sg in segs], axis=1)  # [N, S]
    scol = jax.lax.broadcasted_iota(jnp.int32, (rows, S), 1)
    picks = []
    vals, idxs = [], []
    for _ in range(3):
        v = jnp.max(m, axis=1)
        s_star = jnp.min(jnp.where(m >= v[:, None], scol, S), axis=1)
        xs = segs[0]
        for s in range(1, S):  # the one full-width pass of the round
            xs = jnp.where((s_star == s)[:, None], segs[s], xs)
        for ps, pl in picks:  # re-apply prior picks inside this segment
            xs = jnp.where((s_star == ps)[:, None]
                           & (cols == pl[:, None]), NEG_INF, xs)
        l_star = jnp.min(jnp.where(xs >= v[:, None], cols, 128), axis=1)
        vals.append(v)
        idxs.append(s_star * 128 + l_star)
        xs = jnp.where(cols == l_star[:, None], NEG_INF, xs)
        new_m = jnp.max(xs, axis=1)
        m = jnp.where(scol == s_star[:, None], new_m[:, None], m)
        picks.append((s_star, l_star))
    return jnp.stack(vals, 1), jnp.stack(idxs, 1)  # [N, 3]


# ======================================================================
# shared per-step cell math (operates on VMEM-resident values)
# ======================================================================
def _chunk_target(rows: int) -> int:
    """Chunk width budget: keep the [rows, chunk] stack temporaries
    roughly constant across tile sizes (16 MB scoped-VMEM ceiling)."""
    return 2560 if rows <= 72 else max(1280, 2560 * 72 // rows // 128 * 128)


def _vocab_chunk(vp: int, target: int = 2560) -> int:
    """Largest 128-multiple chunk <= target that divides vp — caps every
    [rows, chunk] temporary so the kernel fits VMEM at full vocab."""
    lanes = vp // 128
    best = vp
    for d in range(1, lanes + 1):
        if lanes % d == 0 and (lanes // d) * 128 <= target:
            best = (lanes // d) * 128
            break
    return best


def _select_aug(x, onehot_f, n_styles: int):
    """Per-row weight-bank selection operand: [Rows, In] -> [Rows, S*In]
    with block s equal to x on rows of style s and 0 elsewhere.  Built by
    lane-axis concat (Mosaic rejects cross sublane/lane reshapes); the
    matching weight operand stacks the S banks along the contraction axis,
    so bank selection rides the MXU as one augmented matmul."""
    return jnp.concatenate(
        [x * onehot_f[:, s:s + 1].astype(x.dtype) for s in range(n_styles)],
        axis=1,
    )


def _cell_core_multi(word, h, feats, att1, ua_w, ua_b, va,
                     wih_aug, whh_aug, bih_s, bhh_s, onehot_f, hd: int,
                     n_styles: int):
    """_cell_core with a per-row GRU weight bank: attention is shared
    (the hypernet generates only the GRU cell, hypernet_attention.py:68-99);
    gi/gh select each row's theta via the augmented matmul; biases select
    via a [Rows, S] x [S, 3H] matmul."""
    cdt = feats.dtype
    att2 = jnp.dot(h, ua_w, preferred_element_type=jnp.float32) + ua_b
    e = jnp.tanh(att1 + att2[:, None, :].astype(cdt))
    s = jnp.sum(e * va.astype(cdt)[None, None, :], axis=2).astype(jnp.float32)
    s = s - jnp.max(s, axis=1, keepdims=True)
    w = jnp.exp(s)
    w = w / jnp.sum(w, axis=1, keepdims=True)
    ctx = jnp.sum(w.astype(cdt)[:, :, None] * feats, axis=1).astype(
        jnp.float32
    )

    x = jnp.concatenate([word, ctx], axis=1)
    bih = jnp.dot(onehot_f, bih_s, preferred_element_type=jnp.float32)
    bhh = jnp.dot(onehot_f, bhh_s, preferred_element_type=jnp.float32)
    gi = jnp.dot(
        _select_aug(x.astype(wih_aug.dtype), onehot_f, n_styles), wih_aug,
        preferred_element_type=jnp.float32,
    ) + bih
    gh = jnp.dot(
        _select_aug(h.astype(whh_aug.dtype), onehot_f, n_styles), whh_aug,
        preferred_element_type=jnp.float32,
    ) + bhh
    r = jax.nn.sigmoid(gi[:, :hd] + gh[:, :hd])
    z = jax.nn.sigmoid(gi[:, hd:2 * hd] + gh[:, hd:2 * hd])
    n = jnp.tanh(gi[:, 2 * hd:] + r * gh[:, 2 * hd:])
    return (1.0 - z) * n + z * h


def _cell_core(word, h, feats, att1, ua_w, ua_b, va, wih_t, whh_t, bih, bhh,
               hd: int):
    """Attention + GRU for a [Rows] tile -> h_new [Rows, H] (f32).

    ``feats``/``att1`` may be bfloat16 (production) — the 3D attention
    temporaries are the largest stack allocations in the kernel, so they
    stay in the input dtype; reductions accumulate in f32 on the MXU."""
    cdt = feats.dtype
    att2 = jnp.dot(h, ua_w, preferred_element_type=jnp.float32) + ua_b
    e = jnp.tanh(att1 + att2[:, None, :].astype(cdt))        # [Rows,R,H] cdt
    # score = e . v_a as a lane-axis multiply-reduce (Mosaic rejects 3D x
    # vector contractions)
    s = jnp.sum(e * va.astype(cdt)[None, None, :], axis=2).astype(jnp.float32)
    s = s - jnp.max(s, axis=1, keepdims=True)
    w = jnp.exp(s)
    w = w / jnp.sum(w, axis=1, keepdims=True)
    # ctx = sum_R w * feats (Mosaic cannot lower a batched matvec; the
    # multiply-reduce stays in the compute dtype to bound stack temps)
    ctx = jnp.sum(w.astype(cdt)[:, :, None] * feats, axis=1).astype(
        jnp.float32
    )                                                        # [Rows,F]

    x = jnp.concatenate([word, ctx], axis=1)                 # [Rows,E+F]
    gi = jnp.dot(x.astype(wih_t.dtype), wih_t,
                 preferred_element_type=jnp.float32) + bih
    gh = jnp.dot(h.astype(whh_t.dtype), whh_t,
                 preferred_element_type=jnp.float32) + bhh
    r = jax.nn.sigmoid(gi[:, :hd] + gh[:, :hd])
    z = jax.nn.sigmoid(gi[:, hd:2 * hd] + gh[:, hd:2 * hd])
    n = jnp.tanh(gi[:, 2 * hd:] + r * gh[:, 2 * hd:])
    return (1.0 - z) * n + z * h


def _chunked_logits_top3(h_new, fcw_ref, fcb_ref, vp: int,
                         with_logz: bool = True, seg_top3: bool = False):
    """Vocab-chunked logits -> per-row top-3 raw logits + logsumexp.

    top-3 by raw logits equals top-3 by log-softmax (per-row monotone
    shift), so the full [rows, vp] logits never materialize: each chunk
    contributes local top-3 + flash-style (max, sum) accumulators, merged
    at the end.  Returns (v3 raw [rows,3], i3 global idx [rows,3],
    logz [rows] = logsumexp of the row)."""
    rows = h_new.shape[0]
    c = _vocab_chunk(vp, _chunk_target(rows))
    n_chunks = vp // c
    vs, is_ = [], []
    m = jnp.full((rows,), NEG_INF)
    ssum = jnp.zeros((rows,))
    for j in range(n_chunks):
        logits = (
            jnp.dot(h_new, fcw_ref[:, j * c:(j + 1) * c],
                    preferred_element_type=jnp.float32)
            + fcb_ref[j * c:(j + 1) * c]
        )
        v3, i3 = _top3(logits, seg=seg_top3)
        vs.append(v3)
        is_.append(i3 + j * c)
        if with_logz:
            # chunk max = the round-1 top value (no extra reduction)
            new_m = jnp.maximum(m, v3[:, 0])
            ssum = ssum * jnp.exp(m - new_m) + jnp.sum(
                jnp.exp(logits - new_m[:, None]), axis=1
            )
            m = new_m
    vall = jnp.concatenate(vs, axis=1)    # [rows, 3*n_chunks]
    iall = jnp.concatenate(is_, axis=1)
    v3, sel = _top3(vall)
    cols = jax.lax.broadcasted_iota(jnp.int32, iall.shape, 1)
    i3 = jnp.stack(
        [
            jnp.sum(
                jnp.where(cols == sel[:, jj][:, None], iall, 0), axis=1
            )
            for jj in range(3)
        ],
        axis=1,
    )
    logz = m + jnp.log(ssum) if with_logz else jnp.zeros((rows,))
    return v3, i3, logz


def _chunked_logits_top1(h_new, fcw_ref, fcb_ref, vp: int):
    """Vocab-chunked argmax of the logits (greedy fast path: one
    max/argmax per chunk, no masking rounds, no logsumexp)."""
    rows = h_new.shape[0]
    c = _vocab_chunk(vp, _chunk_target(rows))
    best_v = jnp.full((rows,), NEG_INF)
    best_i = jnp.zeros((rows,), jnp.int32)
    for j in range(vp // c):
        logits = (
            jnp.dot(h_new, fcw_ref[:, j * c:(j + 1) * c],
                    preferred_element_type=jnp.float32)
            + fcb_ref[j * c:(j + 1) * c]
        )
        v = jnp.max(logits, axis=1)
        i = _first_argmax(logits, axis=1) + j * c
        take = v > best_v
        best_v = jnp.where(take, v, best_v)
        best_i = jnp.where(take, i, best_i)
    return best_i


def _embed_lookup(tok, emb_ref, vp: int):
    """Chunked one-hot matmul embedding gather: tok [Rows] -> [Rows, E]."""
    rows = tok.shape[0]
    c = _vocab_chunk(vp, _chunk_target(rows))
    out = jnp.zeros((rows, emb_ref.shape[1]), jnp.float32)
    for j in range(vp // c):
        chunk = emb_ref[j * c:(j + 1) * c, :]
        onehot = (
            (tok - j * c)[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (rows, c), 1)
        ).astype(chunk.dtype)
        out = out + jnp.dot(onehot, chunk,
                            preferred_element_type=jnp.float32)
    return out


# ======================================================================
# greedy kernel
# ======================================================================
def _greedy_kernel(feats_ref, att1_ref, h0_ref, style_ref,
                   emb_ref, ua_w_ref, ua_b_ref, va_ref,
                   wih_ref, whh_ref, bih_ref, bhh_ref, fcw_ref, fcb_ref,
                   out_ref, h_scr, tok_scr, done_scr,
                   *, max_len: int, hd: int, vp: int, end_id: int,
                   n_valid: int, n_styles: int = 1):
    rows = h0_ref.shape[0]
    h_scr[:] = h0_ref[:]
    tok_scr[:] = jnp.zeros((rows, 1), jnp.int32)
    # batch-padding rows start done so they can't defeat the early exit
    row_global = (
        pl.program_id(0) * rows
        + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    )
    done_scr[:] = (row_global >= n_valid).astype(jnp.int32)

    ua_w, ua_b, va = ua_w_ref[:], ua_b_ref[:], va_ref[:]
    wih_t, whh_t = wih_ref[:], whh_ref[:]
    bih, bhh = bih_ref[:], bhh_ref[:]
    if n_styles > 1:
        onehot_f = (
            style_ref[:, 0][:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (rows, n_styles), 1)
        ).astype(jnp.float32)

    out_ref[:] = jnp.zeros((rows, max_len), jnp.int32)

    def body(t, _):
        tok = tok_scr[:, 0]
        done = done_scr[:, 0]
        word = _embed_lookup(tok, emb_ref, vp)
        h = h_scr[:]
        if n_styles > 1:
            h_new = _cell_core_multi(
                word, h, feats_ref[:], att1_ref[:], ua_w, ua_b, va,
                wih_t, whh_t, bih, bhh, onehot_f, hd, n_styles,
            )
        else:
            h_new = _cell_core(
                word, h, feats_ref[:], att1_ref[:], ua_w, ua_b, va,
                wih_t, whh_t, bih, bhh, hd,
            )
        nxt = _chunked_logits_top1(h_new, fcw_ref, fcb_ref, vp)
        emit = jnp.where(done == 1, 0, nxt)
        col = jax.lax.broadcasted_iota(jnp.int32, (rows, max_len), 1)
        out_ref[:] = jnp.where(col == t, emit[:, None], out_ref[:])
        done_new = jnp.where(nxt == end_id, 1, done)
        h_scr[:] = jnp.where((done == 1)[:, None], h, h_new)
        tok_scr[:, 0] = jnp.where(done == 1, tok, nxt)
        done_scr[:, 0] = jnp.maximum(done, done_new)
        return 0

    # early exit once every row has emitted </s>: remaining steps only
    # freeze state and write <pad>, which out_ref already holds (real
    # captions finish in ~10-20 steps; random-weight benchmarks don't).
    # The liveness flag travels in the carry — scratch reads inside the
    # while COND would not observe body-side mutations.
    def loop_body(carry):
        t, _ = carry
        body(t, 0)
        return t + 1, jnp.min(done_scr[:, 0]) == 0

    jax.lax.while_loop(
        lambda c: jnp.logical_and(c[0] < max_len, c[1]),
        loop_body, (0, jnp.bool_(True)),
    )


def _pack_weights(decoder_params: Dict, gru_params: Optional[Dict],
                  weight_dtype=jnp.bfloat16):
    """Decoder weight pytree -> kernel operands (V padded to 128).

    ``weight_dtype``: bfloat16 by default (halves VMEM + HBM traffic on
    the MXU path); float32 for bit-parity testing at small vocab sizes."""
    theta = gru_params if gru_params is not None else decoder_params["gru"]
    emb = decoder_params["embed"]
    V, E = emb.shape
    vp = _round_up(V, 128)
    emb_p = jnp.zeros((vp, E), weight_dtype).at[:V].set(emb.astype(weight_dtype))
    fc_w = decoder_params["fc"]["w"]
    H = fc_w.shape[0]
    fcw_p = jnp.zeros((H, vp), weight_dtype).at[:, :V].set(fc_w.astype(weight_dtype))
    fcb_p = jnp.full((vp,), NEG_INF, jnp.float32).at[:V].set(
        decoder_params["fc"]["b"].astype(jnp.float32)
    )
    att = decoder_params["attention"]
    return {
        "emb": emb_p,
        "ua_w": att["U_a"]["w"].astype(weight_dtype),
        "ua_b": att["U_a"]["b"].astype(jnp.float32),
        "va": att["v_a"]["w"][:, 0].astype(jnp.float32),
        "wih_t": theta["w_ih"].T.astype(weight_dtype),
        "whh_t": theta["w_hh"].T.astype(weight_dtype),
        "bih": theta["b_ih"].astype(jnp.float32),
        "bhh": theta["b_hh"].astype(jnp.float32),
        "fc_w": fcw_p,
        "fc_b": fcb_p,
        "vp": vp,
    }


def _pack_weight_bank(weights: Dict, thetas: Dict,
                      weight_dtype=jnp.bfloat16) -> Dict:
    """Stack S gru thetas (leading axis) into the augmented-matmul bank
    layout consumed by _cell_core_multi; overrides the single-theta
    entries of a ``_pack_weights`` dict in place."""
    S = thetas["w_ih"].shape[0]
    weights["wih_t"] = jnp.concatenate(
        [thetas["w_ih"][s].T.astype(weight_dtype) for s in range(S)], axis=0
    )  # [S*In, 3H]
    weights["whh_t"] = jnp.concatenate(
        [thetas["w_hh"][s].T.astype(weight_dtype) for s in range(S)], axis=0
    )  # [S*H, 3H]
    weights["bih"] = thetas["b_ih"].astype(jnp.float32)  # [S, 3H]
    weights["bhh"] = thetas["b_hh"].astype(jnp.float32)
    weights["n_styles"] = S
    return weights


def _prep_features(decoder_params, raw_features):
    """encode features + precompute att1 = W_a f + b_a and h0."""
    from captionax.models.layers import linear

    feats = dec.encode_features(decoder_params, raw_features)
    att1 = linear(decoder_params["attention"]["W_a"], feats)
    h0 = dec.init_hidden(decoder_params, feats)
    return feats, att1, h0


@functools.partial(
    jax.jit,
    static_argnames=("max_len", "end_id", "block_rows", "interpret", "f32"),
)
def fused_greedy(
    decoder_params: Dict,
    raw_features: jnp.ndarray,
    gru_params: Optional[Dict] = None,
    max_len: int = 20,
    end_id: int = 2,
    block_rows: Optional[int] = None,
    interpret: bool = False,
    f32: bool = False,
    style_rows: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Greedy decode, one fused kernel.  Returns ids [B, max_len].

    Mixed-style batches: pass ``gru_params`` with a leading style axis plus
    ``style_rows`` [B] (see fused_beam_search).  ``block_rows`` defaults
    to the fastest measured tile at production dims (B=1024, V=9684):
    32 single-style (+19% over the old 64), 48 mixed — smaller tiles
    exit the decode loop earlier per-tile and fit VMEM with headroom."""
    multi = gru_params is not None and gru_params["w_ih"].ndim == 3
    if multi and style_rows is None:
        raise ValueError(
            "gru_params has a leading style axis; pass style_rows [B]"
        )
    if block_rows is None:
        block_rows = 48 if multi else 32
    if (not interpret and raw_features.shape[0] > block_rows
            and block_rows % 8):
        raise ValueError(
            f"block_rows={block_rows} must divide by 8 for multi-tile "
            "launches (Mosaic sublane tile)"
        )
    cdt = jnp.float32 if f32 else jnp.bfloat16
    w = _pack_weights(decoder_params, None if multi else gru_params, cdt)
    if multi:
        w = _pack_weight_bank(w, gru_params, cdt)
    feats, att1, h0 = _prep_features(decoder_params, raw_features)
    feats = feats.astype(cdt)
    att1 = att1.astype(cdt)
    B, R, F = feats.shape
    H = h0.shape[1]
    rows = _round_up(B, block_rows)
    pad = rows - B
    if pad:
        feats = jnp.pad(feats, ((0, pad), (0, 0), (0, 0)))
        att1 = jnp.pad(att1, ((0, pad), (0, 0), (0, 0)))
        h0 = jnp.pad(h0, ((0, pad), (0, 0)))
    styles = (
        jnp.zeros((B,), jnp.int32) if not multi
        # Clamp to [0, S): an out-of-range row would otherwise select an
        # all-zero one-hot in _cell_core_multi and decode with bias-only
        # GRU weights — silently wrong captions rather than an error.
        else jnp.clip(jnp.asarray(style_rows, jnp.int32),
                      0, gru_params["w_ih"].shape[0] - 1)
    )
    styles = jnp.pad(styles, (0, pad))[:, None]
    grid = rows // block_rows

    kernel = functools.partial(
        _greedy_kernel, max_len=max_len, hd=H, vp=w["vp"], end_id=end_id,
        n_valid=B, n_styles=w.get("n_styles", 1),
    )
    tile = lambda *shape: pl.BlockSpec(
        (block_rows,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            tile(R, F), tile(R, H), tile(H), tile(1),
            full(), full(), full(), full(),
            full(), full(), full(), full(), full(), full(),
        ],
        out_specs=tile(max_len),
        out_shape=jax.ShapeDtypeStruct((rows, max_len), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((block_rows, H), jnp.float32),
            pltpu.VMEM((block_rows, 1), jnp.int32),
            pltpu.VMEM((block_rows, 1), jnp.int32),
        ],
        interpret=interpret,
    )(
        feats, att1, h0, styles,
        w["emb"], w["ua_w"], w["ua_b"], w["va"],
        w["wih_t"], w["whh_t"], w["bih"], w["bhh"], w["fc_w"], w["fc_b"],
    )
    return out[:B]


# ======================================================================
# beam kernel (k = 3)
# ======================================================================
def _beam_kernel(feats_ref, att1_ref, h0_ref, style_ref,
                 emb_ref, ua_w_ref, ua_b_ref, va_ref,
                 wih_ref, whh_ref, bih_ref, bhh_ref, fcw_ref, fcb_ref,
                 seq_ref, score_ref, len_ref, found_ref,
                 h_scr, tok_scr, hist_scr, score_scr,
                 best_seq_scr, best_val_scr,
                 *, max_steps: int, hd: int, vp: int, end_id: int, k: int,
                 n_valid: int, n_styles: int = 1, ablate: str = ""):
    rows = h0_ref.shape[0]          # images * k
    n_img = rows // k
    T = max_steps + 1

    # Everything in this kernel lives at [rows, ...] granularity (rows =
    # images * k): Mosaic cannot reshape across the sublane/lane boundary
    # ([rows, 3] -> [n_img, 9]), so per-image regrouping/reduction is
    # expressed with tiny selection-matrix matmuls and same-image masks.
    h_scr[:] = h0_ref[:]
    tok_scr[:] = jnp.zeros((rows, 1), jnp.int32)
    hist_scr[:] = jnp.zeros((rows, T), jnp.int32)
    # beam 0 alive at 0.0; beams 1..k-1 at -inf (step-1 == beam-0-only);
    # batch-padding images start fully retired so they can't defeat the
    # early exit (their outputs are sliced away by the caller)
    beam_col = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)[:, 0] % k
    img_global = (
        pl.program_id(0) * n_img
        + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)[:, 0] // k
    )
    score_scr[:, 0] = jnp.where(
        jnp.logical_and(beam_col == 0, img_global < n_valid), 0.0, NEG_INF
    )
    best_seq_scr[:] = jnp.zeros((rows, T), jnp.int32)
    best_val_scr[:] = jnp.full((rows, 3), NEG_INF, jnp.float32)
    best_val_scr[:, 1] = jnp.zeros((rows,), jnp.float32)
    best_val_scr[:, 2] = jnp.zeros((rows,), jnp.float32)
    # best_val_scr columns (replicated per image): score, length, found

    ua_w, ua_b, va = ua_w_ref[:], ua_b_ref[:], va_ref[:]
    wih_t, whh_t = wih_ref[:], whh_ref[:]
    bih, bhh = bih_ref[:], bhh_ref[:]
    if n_styles > 1:
        # per-row style one-hot, constant across steps (mixed-style batch)
        onehot_f = (
            style_ref[:, 0][:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (rows, n_styles), 1)
        ).astype(jnp.float32)
    else:
        onehot_f = None

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)[:, 0]
    row_img = row_ids // k
    row_beam = row_ids % k
    # same_img[r, r'] = rows r and r' belong to the same image
    same_img = row_img[:, None] == row_img[None, :]          # [rows, rows]
    # P_j[r, r'] = 1 iff r' is beam j of r's image (regroup matmuls)
    P = [
        jnp.logical_and(same_img, row_beam[None, :] == j).astype(jnp.float32)
        for j in range(3)
    ]

    def body(t, _):
        tok = tok_scr[:, 0]
        if "noembed" in ablate:  # profiling-only: skip the embed gather
            word = jnp.zeros((rows, emb_ref.shape[1]), jnp.float32)
        else:
            word = _embed_lookup(tok, emb_ref, vp)
        word = jnp.where(t == 0, jnp.zeros_like(word), word)  # zeroed step 1
        h = h_scr[:]
        if "nocell" in ablate:   # profiling-only: skip attention + GRU
            h_new = h + word[:, :hd]
        elif n_styles > 1:
            h_new = _cell_core_multi(
                word, h, feats_ref[:], att1_ref[:], ua_w, ua_b, va,
                wih_t, whh_t, bih, bhh, onehot_f, hd, n_styles,
            )
        else:
            h_new = _cell_core(
                word, h, feats_ref[:], att1_ref[:], ua_w, ua_b, va,
                wih_t, whh_t, bih, bhh, hd,
            )
        if "nomm" in ablate:     # profiling-only: skip logits matmul+top3
            v3r = h_new[:, :3]
            i3 = jnp.zeros((rows, 3), jnp.int32) + 3
            logz = jnp.zeros((rows,))
        elif "notop3" in ablate:  # profiling-only: matmuls, no top-3 scan
            c = _vocab_chunk(vp)
            acc = jnp.zeros((rows, 3))
            for j in range(vp // c):
                lg = jnp.dot(h_new, fcw_ref[:, j * c:(j + 1) * c],
                             preferred_element_type=jnp.float32)
                acc = acc + lg[:, :3]
            v3r, i3, logz = acc, jnp.zeros((rows, 3), jnp.int32) + 3, acc[:, 0]
        elif "nologz" in ablate:  # profiling-only: top-3 w/o logsumexp
            v3r, i3, logz = _chunked_logits_top3(h_new, fcw_ref, fcb_ref, vp,
                                                 with_logz=False)
        else:
            v3r, i3, logz = _chunked_logits_top3(
                h_new, fcw_ref, fcb_ref, vp,
                seg_top3="segtop3" in ablate)
        scores = score_scr[:, 0]
        # cumulative candidate scores: prev + log_softmax(top-3 raw logits)
        v3 = scores[:, None] + (v3r - logz[:, None])         # [rows, 3]

        if "nobook" in ablate:   # profiling-only: skip beam bookkeeping
            h_scr[:] = h_new
            tok_scr[:, 0] = i3[:, 0]
            score_scr[:, 0] = v3[:, 0]
            return 0

        # every row sees its image's full 9-candidate slate [rows, 9]
        v3f = v3
        i3f = i3.astype(jnp.float32)
        v9 = jnp.concatenate(
            [jnp.dot(P[j], v3f, preferred_element_type=jnp.float32)
             for j in range(3)], axis=1)
        i9 = jnp.concatenate(
            [jnp.dot(P[j], i3f, preferred_element_type=jnp.float32)
             for j in range(3)], axis=1)
        gv, gs = _top3(v9)                                   # [rows, 3]
        # row r (slot j = row_beam[r]) takes selection gs[r, j]
        def col_pick(m, sel):  # m [rows, C] pick per-row column sel [rows]
            C = m.shape[1]
            oh = (
                sel[:, None]
                == jax.lax.broadcasted_iota(jnp.int32, (rows, C), 1)
            ).astype(m.dtype)
            return jnp.sum(oh * m, axis=1)

        sel = col_pick(gs.astype(jnp.float32), row_beam).astype(jnp.int32)
        new_val = col_pick(gv, row_beam)
        new_tok = col_pick(i9, sel).astype(jnp.int32)
        new_parent = sel // 3                                # local 0..k-1

        # permutation: new row r copies old row img(r)*k + parent(r)
        src = row_img * k + new_parent
        perm = (
            src[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
        ).astype(jnp.float32)
        h_scr[:] = jnp.dot(perm, h_new, preferred_element_type=jnp.float32)
        hist = jnp.dot(
            perm, hist_scr[:].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        # write token at position t+1 via iota mask (dynamic column)
        col = jax.lax.broadcasted_iota(jnp.int32, (rows, T), 1)
        hist = jnp.where(col == t + 1, new_tok[:, None], hist)
        hist_scr[:] = hist

        alive_parent = new_val > NEG_INF / 2
        completed = jnp.logical_and(new_tok == end_id, alive_parent)
        cval = jnp.where(completed, new_val, NEG_INF)        # [rows]
        # per-image max of cval, replicated to every row of the image
        cmat = jnp.where(same_img, cval[None, :], NEG_INF)
        cbest = jnp.max(cmat, axis=1)                        # [rows]
        # winning row (first max within the image)
        win_pos = jnp.min(
            jnp.where(
                jnp.logical_and(same_img, cval[None, :] >= cbest[:, None]),
                row_ids[None, :], rows,
            ),
            axis=1,
        )
        improve = jnp.logical_and(cbest > best_val_scr[:, 0], cbest > NEG_INF / 2)
        wsel = (
            win_pos[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
        ).astype(jnp.float32)
        win_seq = jnp.dot(
            wsel, hist.astype(jnp.float32), preferred_element_type=jnp.float32
        ).astype(jnp.int32)
        best_seq_scr[:] = jnp.where(improve[:, None], win_seq, best_seq_scr[:])
        best_val_scr[:, 0] = jnp.where(improve, cbest, best_val_scr[:, 0])
        best_val_scr[:, 1] = jnp.where(
            improve, jnp.float32(t + 2), best_val_scr[:, 1]
        )
        found_now = jnp.max(
            jnp.where(same_img, completed[None, :].astype(jnp.float32), 0.0),
            axis=1,
        )
        best_val_scr[:, 2] = jnp.maximum(best_val_scr[:, 2], found_now)

        score_scr[:, 0] = jnp.where(completed, NEG_INF, new_val)
        tok_scr[:, 0] = new_tok
        return 0

    # Early exit once no live beam can still improve its image's best
    # completion: cumulative scores only decrease (logp <= 0), so a
    # future completion's value is bounded by its parent's current
    # score; when every row's score <= the image's best completed score
    # (strict improvement required, best starts at NEG_INF), best/found/
    # len can never change again — identical outputs, fewer steps.
    # Real captions resolve in ~10-25 steps; random-weight benchmarks
    # never complete and still run all max_steps.  The liveness flag
    # travels in the carry — scratch reads inside the while COND would
    # not observe body-side mutations.
    def loop_body(carry):
        t, _ = carry
        body(t, 0)
        improvable = jnp.max(score_scr[:, 0] - best_val_scr[:, 0]) > 0.0
        return t + 1, improvable

    t_final, _ = jax.lax.while_loop(
        lambda c: jnp.logical_and(c[0] < max_steps, c[1]),
        loop_body, (0, jnp.bool_(True)),
    )

    # per-image outputs = beam-0 rows of the replicated best buffers
    img_ids = jax.lax.broadcasted_iota(jnp.int32, (n_img, rows), 0)
    s0 = jnp.logical_and(
        row_img[None, :] == img_ids, row_beam[None, :] == 0
    ).astype(jnp.float32)                                    # [n_img, rows]
    bseq = jnp.dot(
        s0, best_seq_scr[:].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    bval = jnp.dot(s0, best_val_scr[:], preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (n_img, T), 1)
    found = bval[:, 2] > 0
    lens = jnp.where(found, bval[:, 1], 0.0).astype(jnp.int32)
    seq_ref[:] = jnp.where(col < lens[:, None], bseq, 0)
    score_ref[:, 0] = bval[:, 0]
    if "debugt" in ablate:   # profiling-only: report the exit step
        len_ref[:, 0] = jnp.zeros((n_img,), jnp.int32) + t_final
    else:
        len_ref[:, 0] = lens
    found_ref[:, 0] = found.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_steps", "end_id", "block_images", "interpret", "f32", "ablate"
    ),
)
def fused_beam_search(
    decoder_params: Dict,
    raw_features: jnp.ndarray,
    gru_params: Optional[Dict] = None,
    max_steps: int = 50,
    end_id: int = 2,
    block_images: Optional[int] = None,
    interpret: bool = False,
    f32: bool = False,
    ablate: str = "",
    style_rows: Optional[jnp.ndarray] = None,
):
    """k=3 beam search, one fused kernel.  Returns a BeamResult-compatible
    tuple (tokens [B, max_steps+1], scores [B], found [B], lengths [B]).

    ``block_images`` defaults to the largest tile that fits the 16 MB
    scoped-VMEM ceiling at production dims: 24 single-style, 16 for
    mixed-style theta banks (the S-wide augmented weight banks and
    per-row selection operands cost ~0.6 MB extra at 24, measured OOM).

    Mixed-style batches: pass ``gru_params`` with a leading style axis
    (S thetas, e.g. from synthesize_theta_batched over the S style
    embeddings) plus ``style_rows`` [B] int32 in [0, S) — the whole theta
    bank stays resident in VMEM and each row selects its style via an
    augmented MXU matmul, so one kernel launch serves every style at once
    (the reference can only decode batch-homogeneous styles; its collate
    enforces one style per batch, data_loader.py:287-298).

    ``ablate`` is PROFILING-ONLY (benchmarks/kernel_ablate.py): a comma
    list of {noembed, nocell, nomm, notop3, nologz, nobook, segtop3}
    that skips (or, for segtop3, reroutes) kernel
    stages to attribute per-step cost; results are semantically wrong.
    """
    from captionax.decode.search import BeamResult

    k = 3
    multi = gru_params is not None and gru_params["w_ih"].ndim == 3
    if multi and style_rows is None:
        raise ValueError(
            "gru_params has a leading style axis; pass style_rows [B] "
            "(or index the thetas down to one style)"
        )
    if block_images is None:
        block_images = 16 if multi else 24
    B_in = raw_features.shape[0]
    if (not interpret and B_in > block_images and (block_images * k) % 8):
        # Mosaic needs the sublane tile to divide by 8 unless the tile IS
        # the whole array (single-tile grid) — fail with a clear message
        # instead of the lowering's block-shape error (e.g. block 20).
        raise ValueError(
            f"block_images={block_images} gives {block_images * k} beam rows "
            "per tile; multi-tile launches need the row tile to divide by 8 "
            "— use a multiple of 8 images (e.g. 16, 24, 32)"
        )
    cdt = jnp.float32 if f32 else jnp.bfloat16
    w = _pack_weights(decoder_params, None if multi else gru_params, cdt)
    if multi:
        w = _pack_weight_bank(w, gru_params, cdt)
    feats, att1, h0 = _prep_features(decoder_params, raw_features)
    feats = feats.astype(cdt)
    att1 = att1.astype(cdt)
    B, R, F = feats.shape
    H = h0.shape[1]
    T = max_steps + 1

    n_img = _round_up(B, block_images)
    pad = n_img - B
    if pad:
        feats = jnp.pad(feats, ((0, pad), (0, 0), (0, 0)))
        att1 = jnp.pad(att1, ((0, pad), (0, 0), (0, 0)))
        h0 = jnp.pad(h0, ((0, pad), (0, 0)))
    styles = (
        jnp.zeros((B,), jnp.int32) if not multi
        # Clamp to [0, S) — see fused_greedy: out-of-range rows would
        # select zero GRU weights and emit silently wrong captions.
        else jnp.clip(jnp.asarray(style_rows, jnp.int32),
                      0, gru_params["w_ih"].shape[0] - 1)
    )
    styles = jnp.pad(styles, (0, pad))[:, None]  # [n_img, 1]
    # expand to beam rows [n_img*k, ...]
    expand = lambda x: jnp.repeat(x, k, axis=0)
    feats_r, att1_r, h0_r = expand(feats), expand(att1), expand(h0)
    styles_r = expand(styles)

    rows_blk = block_images * k
    grid = n_img // block_images
    kernel = functools.partial(
        _beam_kernel, max_steps=max_steps, hd=H, vp=w["vp"],
        end_id=end_id, k=k, n_valid=B, ablate=ablate,
        n_styles=w.get("n_styles", 1),
    )
    rtile = lambda *shape: pl.BlockSpec(
        (rows_blk,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    itile = lambda *shape: pl.BlockSpec(
        (block_images,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    seq, score, length, found = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            rtile(R, F), rtile(R, H), rtile(H), rtile(1),
            full(), full(), full(), full(),
            full(), full(), full(), full(), full(), full(),
        ],
        out_specs=(itile(T), itile(1), itile(1), itile(1)),
        out_shape=(
            jax.ShapeDtypeStruct((n_img, T), jnp.int32),
            jax.ShapeDtypeStruct((n_img, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_img, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_img, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows_blk, H), jnp.float32),
            pltpu.VMEM((rows_blk, 1), jnp.int32),
            pltpu.VMEM((rows_blk, T), jnp.int32),
            pltpu.VMEM((rows_blk, 1), jnp.float32),
            pltpu.VMEM((rows_blk, T), jnp.int32),
            pltpu.VMEM((rows_blk, 3), jnp.float32),
        ],
        interpret=interpret,
    )(
        feats_r, att1_r, h0_r, styles_r,
        w["emb"], w["ua_w"], w["ua_b"], w["va"],
        w["wih_t"], w["whh_t"], w["bih"], w["bhh"], w["fc_w"], w["fc_b"],
    )
    return BeamResult(
        seq[:B], score[:B, 0], found[:B, 0].astype(bool), length[:B, 0]
    )
