"""Fused teacher-forced recurrence for TRAINING — forward + custom-VJP
backward as Pallas kernels.

Why: the hypernet/GRU train step is latency-bound in the 25-step
recurrence, not FLOP-bound (benchmarks/trainstep_roofline.py: the scan
runs 0.124 ms/step vs 0.004 ms at MXU peak — ~30x off roofline — and
the remat backward replays it).  XLA cannot pipeline the sequential
tiny-GEMM steps; one kernel holding the whole T-step loop in VMEM can.
The vocab projection + CE stay OUTSIDE (they are one large GEMM XLA
already runs near peak — fused_ce_from_hidden), as do the encoder MLP,
``att1 = W_a f``, h0 and the embedding lookup (all single large
differentiable XLA ops).

Semantics: identical to ``models.decoder.teacher_forced_hidden`` with
pure teacher forcing (sample_prob=0) — the t=0 zero-embedding quirk
(decoderlstm.py:83-84) and torch GRU gate order are preserved; values
differ from the scan only by f32 reassociation (att1 is computed once
instead of per step — same contraction, different order).  Equality is
test-enforced in tests/test_train_kernel.py (forward allclose + grads
vs jax.grad of the scan path).

The backward recomputes each step's attention/gate forward from the
saved hidden-state sequence (hs is the forward OUTPUT, so this is free
remat: no extra residuals beyond what the loss needs anyway) and runs
the exact BPTT in one reverse fori_loop, accumulating weight gradients
in VMEM.  Per-tile weight grads are summed across the (sequential)
grid outside the kernel.

VJP inputs/outputs (all differentiable): features (encoded, [B,R,F]),
att1 [B,R,H], h0 [B,H], embeds [B,T,E], U_a w/b, v_a w, w_ih^T, w_hh^T,
b_ih, b_hh.  d(v_a bias) is identically 0 (softmax shift invariance)
and the W_a/embedding/encoder/h0-head grads flow through the outside
XLA ops.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from captionax.models import decoder as dec
from captionax.models.layers import embedding, linear


def _cell_fwd(word, h, feats, att1, ua_w, ua_b, va, wih_t, whh_t, bih, bhh,
              hd: int):
    """One attention+GRU step (mirrors ops.decode_kernel._cell_core).
    h is f32; feats/att1 may be bf16 (big 3D temps stay in that dtype,
    matmuls accumulate f32)."""
    cdt = feats.dtype
    att2 = jnp.dot(h.astype(cdt), ua_w,
                   preferred_element_type=jnp.float32) + ua_b
    a = jnp.tanh(att1 + att2[:, None, :].astype(cdt))      # [Rows,R,H]
    s = jnp.sum(a * va[None, None, :].astype(cdt), axis=2).astype(jnp.float32)
    s = s - jnp.max(s, axis=1, keepdims=True)
    w = jnp.exp(s)
    w = w / jnp.sum(w, axis=1, keepdims=True)
    ctx = jnp.sum(w.astype(cdt)[:, :, None] * feats, axis=1).astype(
        jnp.float32)
    x = jnp.concatenate([word, ctx], axis=1)               # [Rows,E+F]
    gi = jnp.dot(x.astype(cdt), wih_t,
                 preferred_element_type=jnp.float32) + bih
    gh = jnp.dot(h.astype(cdt), whh_t,
                 preferred_element_type=jnp.float32) + bhh
    r = jax.nn.sigmoid(gi[:, :hd] + gh[:, :hd])
    z = jax.nn.sigmoid(gi[:, hd:2 * hd] + gh[:, hd:2 * hd])
    n = jnp.tanh(gi[:, 2 * hd:] + r * gh[:, 2 * hd:])
    return (1.0 - z) * n + z * h


def _fwd_kernel(feats_ref, att1_ref, h0_ref, emb_ref, ua_w_ref, ua_b_ref,
                va_ref, wih_ref, whh_ref, bih_ref, bhh_ref, hs_ref, *,
                T: int, hd: int):
    feats = feats_ref[:]
    att1 = att1_ref[:]
    ua_w, ua_b = ua_w_ref[:], ua_b_ref[0]
    va = va_ref[0]
    wih, whh = wih_ref[:], whh_ref[:]
    bih, bhh = bih_ref[0], bhh_ref[0]
    # time rides the LEADING (untiled) axis of emb/hs (Mosaic rejects
    # dynamic 1-slices along the sublane axis of [rows, T, ...] refs),
    # and emb comes PRE-SHIFTED (row 0 = the zero word of the t=0
    # quirk, row t = embeds[t-1]) so the step has no t==0 select —
    # scalar-cond jnp.where between a squeezed slice and a ref read
    # trips Mosaic relayout inference
    def step(t, h):
        word = emb_ref[pl.ds(t, 1)][0].astype(jnp.float32)
        h = _cell_fwd(word, h, feats, att1, ua_w, ua_b, va, wih, whh,
                      bih, bhh, hd)
        hs_ref[pl.ds(t, 1)] = h[None].astype(hs_ref.dtype)
        return h

    jax.lax.fori_loop(0, T, step, h0_ref[:].astype(jnp.float32))


def _bwd_kernel(feats_ref, att1_ref, emb_ref, ua_w_ref, ua_b_ref,
                va_ref, wih_ref, whh_ref, bih_ref, bhh_ref, wihT_ref,
                whhT_ref, uawT_ref, hsp_ref, g_ref,
                d_feats_ref, d_att1_ref, d_h0_ref, d_emb_ref, d_ua_w_ref,
                d_ua_b_ref, d_va_ref, d_wih_ref, d_whh_ref, d_bih_ref,
                d_bhh_ref, datt2_scr, *, T: int, hd: int):
    """``emb_ref`` is the pre-shifted word sequence (row t = the word
    consumed at step t; row 0 is the zero word) and ``hsp_ref`` the
    pre-shifted hidden sequence (row t = h_{t-1}; row 0 is h0) — both
    built outside so the reverse loop needs no t==0 selects.

    ``wihT/whhT/uawT`` are the opposite-direction weight copies
    (transposed OUTSIDE the kernel — the in-kernel ``.astype(f32).T``
    copies cost 1.6MB of scoped VMEM per step).  Weight gradients
    accumulate directly into constant-index output blocks (revisited
    across the sequential grid, zeroed at tile 0) instead of loop
    carries + per-tile partials — together these cuts fit the kernel in
    the 16MB scoped-VMEM budget at 16 rows (32 overflows by 10MB)."""
    feats = feats_ref[:]
    att1 = att1_ref[:]
    cdt = feats.dtype
    ua_w, ua_b = ua_w_ref[:], ua_b_ref[0]
    va = va_ref[0]
    wih, whh = wih_ref[:], whh_ref[:]
    wihT, whhT, uawT = wihT_ref[:], whhT_ref[:], uawT_ref[:]
    bih, bhh = bih_ref[0], bhh_ref[0]
    rows, R, F = feats.shape
    E = emb_ref.shape[2]
    In = wih.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _zero_weight_grads():
        d_ua_w_ref[:] = jnp.zeros_like(d_ua_w_ref)
        d_ua_b_ref[:] = jnp.zeros_like(d_ua_b_ref)
        d_va_ref[:] = jnp.zeros_like(d_va_ref)
        d_wih_ref[:] = jnp.zeros_like(d_wih_ref)
        d_whh_ref[:] = jnp.zeros_like(d_whh_ref)
        d_bih_ref[:] = jnp.zeros_like(d_bih_ref)
        d_bhh_ref[:] = jnp.zeros_like(d_bhh_ref)

    def step(i, carry):
        t = T - 1 - i
        (dh, d_feats, d_att1) = carry
        h_prev = hsp_ref[pl.ds(t, 1)][0].astype(jnp.float32)
        word = emb_ref[pl.ds(t, 1)][0].astype(jnp.float32)

        # ---- recompute the step forward (free remat off hs) ----
        att2 = jnp.dot(h_prev.astype(cdt), ua_w,
                       preferred_element_type=jnp.float32) + ua_b
        a = jnp.tanh(att1 + att2[:, None, :].astype(cdt))   # [rows,R,H] cdt
        s = jnp.sum(a * va[None, None, :].astype(cdt),
                    axis=2).astype(jnp.float32)
        s = s - jnp.max(s, axis=1, keepdims=True)
        w = jnp.exp(s)
        w = w / jnp.sum(w, axis=1, keepdims=True)           # [rows,R] f32
        ctx = jnp.sum(w.astype(cdt)[:, :, None] * feats, axis=1).astype(
            jnp.float32)
        x = jnp.concatenate([word, ctx], axis=1)
        gi = jnp.dot(x.astype(cdt), wih,
                     preferred_element_type=jnp.float32) + bih
        gh = jnp.dot(h_prev.astype(cdt), whh,
                     preferred_element_type=jnp.float32) + bhh
        r = jax.nn.sigmoid(gi[:, :hd] + gh[:, :hd])
        z = jax.nn.sigmoid(gi[:, hd:2 * hd] + gh[:, hd:2 * hd])
        gh_n = gh[:, 2 * hd:]
        n = jnp.tanh(gi[:, 2 * hd:] + r * gh_n)

        # ---- backward through the step ----
        dh_new = g_ref[pl.ds(t, 1)][0].astype(jnp.float32) + dh
        dz = dh_new * (h_prev - n)
        dn = dh_new * (1.0 - z)
        dh_prev = dh_new * z
        dpre_n = dn * (1.0 - n * n)
        dr = dpre_n * gh_n
        dpre_r = dr * r * (1.0 - r)
        dpre_z = dz * z * (1.0 - z)
        dgi = jnp.concatenate([dpre_r, dpre_z, dpre_n], axis=1)  # [rows,3H]
        dgh = jnp.concatenate([dpre_r, dpre_z, dpre_n * r], axis=1)

        d_wih_ref[:] += jax.lax.dot_general(
            x, dgi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [In,3H]
        d_whh_ref[:] += jax.lax.dot_general(
            h_prev, dgh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d_bih_ref[:] += jnp.sum(dgi, axis=0, keepdims=True)
        d_bhh_ref[:] += jnp.sum(dgh, axis=0, keepdims=True)

        # opposite-direction dots use the pre-transposed compute-dtype
        # copies — same operand precision as the scan path's VJP (the
        # cotangent of a bf16 dot is cast to bf16 by XLA)
        dx = jnp.dot(dgi.astype(wihT.dtype), wihT,
                     preferred_element_type=jnp.float32)     # [rows,In]
        dh_prev = dh_prev + jnp.dot(dgh.astype(whhT.dtype), whhT,
                                    preferred_element_type=jnp.float32)
        dword = dx[:, :E]
        dctx = dx[:, E:]

        # stored for every t; row 0 is the zero word's grad, discarded
        # outside (the t=0 quirk)
        d_emb_ref[pl.ds(t, 1)] = dword[None].astype(d_emb_ref.dtype)

        # attention backward
        # sublane-inserting [:, None, :] must happen in f32 and cast
        # AFTER (Mosaic: 'unsupported shape cast' on bf16 [r,F]->[r,1,F];
        # the decode kernel's att2 pattern)
        dctx3 = dctx[:, None, :].astype(cdt)                 # [rows,1,F]
        dw = jnp.sum(dctx3 * feats, axis=2).astype(jnp.float32)  # [rows,R]
        d_feats = d_feats + (w.astype(cdt)[:, :, None] * dctx3).astype(
            d_feats.dtype)
        ds = w * (dw - jnp.sum(w * dw, axis=1, keepdims=True))
        da = ds.astype(cdt)[:, :, None] * va[None, None, :].astype(cdt)
        de_lin = (da * (1.0 - a * a))                        # [rows,R,H] cdt
        d_att1 = d_att1 + de_lin.astype(d_att1.dtype)
        # the axis-1 (sublane) reduce leaves datt2 in an implicit-dim
        # replicated layout that Mosaic cannot relayout into the dim-0
        # contractions below ("Invalid relayout: non-singleton logical
        # dimension is replicated in destination but not in source");
        # a VMEM scratch store/load forces a concrete (8,128) layout
        datt2_scr[:] = jnp.sum(de_lin, axis=1).astype(jnp.float32)
        datt2 = datt2_scr[:]                                 # [rows,H]
        d_ua_w_ref[:] += jax.lax.dot_general(
            h_prev, datt2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d_ua_b_ref[:] += jnp.sum(datt2, axis=0, keepdims=True)
        d_va_ref[:] += jnp.sum(
            a.astype(jnp.float32) * ds[:, :, None], axis=(0, 1),
        )[None, :]
        dh_prev = dh_prev + jnp.dot(datt2.astype(uawT.dtype), uawT,
                                    preferred_element_type=jnp.float32)
        return (dh_prev, d_feats, d_att1)

    H = hd
    # d_feats/d_att1 carries accumulate in the COMPUTE dtype — the scan
    # path's cotangents of these bf16 primals are themselves bf16 (f32
    # carries here cost 1.25MB of the 16MB scoped-VMEM budget; exact in
    # the f32 test mode either way)
    init = (
        jnp.zeros((rows, H), jnp.float32),
        jnp.zeros((rows, R, F), cdt),
        jnp.zeros((rows, R, H), cdt),
    )
    (dh, d_feats, d_att1) = jax.lax.fori_loop(0, T, step, init)
    d_h0_ref[:] = dh.astype(d_h0_ref.dtype)
    d_feats_ref[:] = d_feats.astype(d_feats_ref.dtype)
    d_att1_ref[:] = d_att1.astype(d_att1_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad_rows(arrs, n):
    out = []
    for a in arrs:
        pad = n - a.shape[0]
        out.append(jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                   if pad else a)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def _fused_core(feats, att1, h0, embeds, ua_w, ua_b, va, wih_t, whh_t,
                bih, bhh, block_rows: int, bwd_block_rows: int,
                interpret: bool):
    return _fused_fwd_call(feats, att1, h0, embeds, ua_w, ua_b, va, wih_t,
                           whh_t, bih, bhh, block_rows, interpret)


def _fused_fwd_call(feats, att1, h0, embeds, ua_w, ua_b, va, wih_t, whh_t,
                    bih, bhh, block_rows, interpret):
    B, R, F = feats.shape
    T = embeds.shape[1]
    H = h0.shape[1]
    n = _round_up(B, block_rows)
    feats_p, att1_p, h0_p, emb_p = _pad_rows((feats, att1, h0, embeds), n)
    E = emb_p.shape[2]
    emb_tf = jnp.transpose(emb_p, (1, 0, 2))       # [T, n, E]
    # pre-shifted word sequence: row 0 = the zero word (t=0 quirk),
    # row t = embeds[t-1] — removes the t==0 select from the kernel
    emb_shift = jnp.concatenate(
        [jnp.zeros((1, n, E), emb_tf.dtype), emb_tf[:-1]], axis=0)
    grid = n // block_rows
    rtile = lambda *s: pl.BlockSpec((block_rows,) + s,
                                    lambda i: (i,) + (0,) * len(s))
    # time-leading blocks: full T, row-tiled on axis 1
    ttile = lambda T_, s: pl.BlockSpec((T_, block_rows, s),
                                       lambda i: (0, i, 0))
    wtile = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s))
    hs = pl.pallas_call(
        functools.partial(_fwd_kernel, T=T, hd=H),
        grid=(grid,),
        in_specs=[rtile(R, F), rtile(R, H), rtile(H), ttile(T, E),
                  wtile(H, H), wtile(1, H), wtile(1, H),
                  wtile(wih_t.shape[0], 3 * H), wtile(H, 3 * H),
                  wtile(1, 3 * H), wtile(1, 3 * H)],
        out_specs=ttile(T, H),
        out_shape=jax.ShapeDtypeStruct((T, n, H), jnp.float32),
        interpret=interpret,
    )(feats_p, att1_p, h0_p, emb_shift, ua_w, ua_b[None, :], va[None, :],
      wih_t, whh_t, bih[None, :], bhh[None, :])
    return jnp.transpose(hs, (1, 0, 2))[:B]


def _fused_core_fwd(feats, att1, h0, embeds, ua_w, ua_b, va, wih_t, whh_t,
                    bih, bhh, block_rows, bwd_block_rows, interpret):
    hs = _fused_fwd_call(feats, att1, h0, embeds, ua_w, ua_b, va, wih_t,
                         whh_t, bih, bhh, block_rows, interpret)
    return hs, (feats, att1, h0, embeds, ua_w, ua_b, va, wih_t, whh_t,
                bih, bhh, hs)


def _fused_core_bwd(block_rows, bwd_block_rows, interpret, res, g):
    (feats, att1, h0, embeds, ua_w, ua_b, va, wih_t, whh_t, bih, bhh,
     hs) = res
    B, R, F = feats.shape
    T = embeds.shape[1]
    H = h0.shape[1]
    E = embeds.shape[2]
    In = wih_t.shape[0]
    br = bwd_block_rows
    n = _round_up(B, br)
    feats_p, att1_p, h0_p, emb_p, hs_p, g_p = _pad_rows(
        (feats, att1, h0, embeds, hs, g), n)
    E2 = emb_p.shape[2]
    emb_tf = jnp.transpose(emb_p, (1, 0, 2))   # [T, n, E]
    emb_shift = jnp.concatenate(
        [jnp.zeros((1, n, E2), emb_tf.dtype), emb_tf[:-1]], axis=0)
    hs_tf = jnp.transpose(hs_p, (1, 0, 2))     # [T, n, H]
    # pre-shifted hidden sequence: row t = h_{t-1} (row 0 = h0)
    hsp = jnp.concatenate([h0_p[None].astype(hs_tf.dtype), hs_tf[:-1]],
                          axis=0)
    g_tf = jnp.transpose(g_p, (1, 0, 2))
    grid = n // br
    rtile = lambda *s: pl.BlockSpec((br,) + s, lambda i: (i,) + (0,) * len(s))
    ttile = lambda T_, s: pl.BlockSpec((T_, br, s), lambda i: (0, i, 0))
    wtile = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s))
    # weight-grad outputs: ONE constant-index block revisited by every
    # (sequential) grid step — zeroed at tile 0, accumulated in place
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, T=T, hd=H),
        grid=(grid,),
        in_specs=[rtile(R, F), rtile(R, H), ttile(T, E2),
                  wtile(H, H), wtile(1, H), wtile(1, H), wtile(In, 3 * H),
                  wtile(H, 3 * H), wtile(1, 3 * H), wtile(1, 3 * H),
                  wtile(3 * H, In), wtile(3 * H, H), wtile(H, H),
                  ttile(T, H), ttile(T, H)],
        out_specs=[rtile(R, F), rtile(R, H), rtile(H), ttile(T, E),
                   wtile(H, H), wtile(1, H), wtile(1, H), wtile(In, 3 * H),
                   wtile(H, 3 * H), wtile(1, 3 * H), wtile(1, 3 * H)],
        out_shape=[
            jax.ShapeDtypeStruct((n, R, F), feats.dtype),
            jax.ShapeDtypeStruct((n, R, H), att1.dtype),
            jax.ShapeDtypeStruct((n, H), h0.dtype),
            jax.ShapeDtypeStruct((T, n, E), embeds.dtype),
            jax.ShapeDtypeStruct((H, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((In, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((H, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((br, H), jnp.float32)],
        interpret=interpret,
    )(feats_p, att1_p, emb_shift, ua_w, ua_b[None, :], va[None, :],
      wih_t, whh_t, bih[None, :], bhh[None, :],
      jnp.transpose(wih_t), jnp.transpose(whh_t), jnp.transpose(ua_w),
      hsp, g_tf)
    (d_feats, d_att1, d_h0, d_emb, d_ua_w, d_ua_b, d_va, d_wih, d_whh,
     d_bih, d_bhh) = outs
    return (
        d_feats[:B].astype(feats.dtype),
        d_att1[:B].astype(att1.dtype),
        d_h0[:B].astype(h0.dtype),
        jnp.transpose(
            jnp.concatenate(
                [d_emb[1:],
                 jnp.zeros((1,) + d_emb.shape[1:], d_emb.dtype)], axis=0),
            (1, 0, 2))[:B].astype(embeds.dtype),
        d_ua_w.astype(ua_w.dtype),
        d_ua_b[0].astype(ua_b.dtype),
        d_va[0].astype(va.dtype),
        d_wih.astype(wih_t.dtype),
        d_whh.astype(whh_t.dtype),
        d_bih[0].astype(bih.dtype),
        d_bhh[0].astype(bhh.dtype),
    )


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


def fused_teacher_forced_hidden(
    params: Dict,
    raw_features: jnp.ndarray,
    captions: jnp.ndarray,
    gru_params: Optional[Dict] = None,
    block_rows: int = 48,
    bwd_block_rows: int = 16,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, None]:
    """Drop-in for ``dec.teacher_forced_hidden(...)[0]`` (pure TF) with
    the recurrence as one fused fwd kernel + one fused BPTT bwd kernel.
    Differentiable in every decoder/theta tensor; the attention-weight
    output of the scan path is not produced (the CE path never reads
    it).  v_a's bias gradient is identically zero by softmax shift
    invariance (the scan path agrees to ~1e-8).

    ``interpret=None`` resolves by backend: interpret mode on CPU (the
    Mosaic kernels only lower for TPU), compiled elsewhere — so
    ``fused_scan=True`` train steps work on both without plumbing."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    features = dec.encode_features(params, raw_features)
    h0 = dec.init_hidden(params, features)
    att = params["attention"]
    att1 = linear(att["W_a"], features)
    embeds = embedding(params["embed"], captions)
    cell = params["gru"] if gru_params is None else gru_params
    cdt = raw_features.dtype
    hs = _fused_core(
        features.astype(cdt), att1.astype(cdt), h0, embeds,
        att["U_a"]["w"].astype(cdt), att["U_a"]["b"], att["v_a"]["w"][:, 0],
        jnp.transpose(cell["w_ih"]).astype(cdt),
        jnp.transpose(cell["w_hh"]).astype(cdt),
        cell["b_ih"], cell["b_hh"],
        block_rows, bwd_block_rows, interpret,
    )
    return hs, None
