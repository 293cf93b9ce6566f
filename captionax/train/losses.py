"""Training losses.

``cross_entropy_loss`` reproduces the reference objective
``F.cross_entropy(logits.view(-1, V), caps.view(-1), ignore_index=<pad>)``
(/root/reference/hypernet_attention.py:183): mean over non-pad positions.
``label_smoothing_loss`` reproduces the LaBERT baseline's
LabelSmoothingLoss (/root/reference/baseline/Labert.py:63-93).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_loss(
    logits: jnp.ndarray, targets: jnp.ndarray, pad_id=0
) -> jnp.ndarray:
    """logits [..., V] float, targets [...] int.  Mean CE over non-pad.

    ``pad_id=None`` disables masking (mean over ALL positions) — the
    non-attention hypernet trainer's objective, which passes no
    ignore_index (/root/reference/hypernet.py:145)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if pad_id is None:
        return nll.mean()
    mask = (targets != pad_id).astype(nll.dtype)
    denom = jnp.maximum(mask.sum(), 1.0)
    return (nll * mask).sum() / denom


def fused_ce_from_hidden(
    fc: dict,
    hs: jnp.ndarray,
    targets: jnp.ndarray,
    pad_id: int = 0,
    chunk_rows: int = 2048,
    remat: bool = True,
) -> jnp.ndarray:
    """``cross_entropy_loss(linear(fc, hs), targets)`` without ever
    materializing the [B*T, V] logits (f32 ~1 GB at B=1024/T=25/V=9684).

    Scans over row chunks: each step runs one [C, H] x [H, V] GEMM and
    reduces it to (sum nll, count) immediately; with ``remat`` the
    backward recomputes the chunk logits instead of saving them.  Same
    value as the unfused loss (nll = logsumexp - target logit ==
    -log_softmax[target]), same non-pad mean semantics
    (/root/reference/hypernet_attention.py:183 ignore_index).
    """
    H = hs.shape[-1]
    h2 = hs.reshape(-1, H)
    t1 = targets.reshape(-1)
    n = h2.shape[0]
    c = min(chunk_rows, n)
    n_pad = -(-n // c) * c
    if n_pad != n:
        h2 = jnp.pad(h2, ((0, n_pad - n), (0, 0)))
        # padding rows get pad_id targets -> masked out of the mean
        t1 = jnp.pad(t1, (0, n_pad - n), constant_values=pad_id)
    w, b = fc["w"], fc["b"]

    def body(acc, xs):
        hc, tc = xs
        logits = (
            jnp.dot(hc, w, preferred_element_type=jnp.float32)
            + b.astype(jnp.float32)
        )
        lse = jax.nn.logsumexp(logits, axis=-1)
        tgt = jnp.take_along_axis(logits, tc[:, None], axis=-1)[:, 0]
        mask = (tc != pad_id).astype(jnp.float32)
        return (
            acc[0] + ((lse - tgt) * mask).sum(),
            acc[1] + mask.sum(),
        ), None

    (num, den), _ = jax.lax.scan(
        jax.checkpoint(body) if remat else body,
        (jnp.float32(0.0), jnp.float32(0.0)),
        (h2.reshape(-1, c, H), t1.reshape(-1, c)),
    )
    return num / jnp.maximum(den, 1.0)


def label_smoothing_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    smoothing: float = 0.1,
    pad_id: int = 0,
) -> jnp.ndarray:
    """KL(smoothed one-hot || softmax) averaged over non-pad positions."""
    V = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    confidence = 1.0 - smoothing
    low = smoothing / (V - 1)
    onehot = jax.nn.one_hot(targets, V, dtype=logits.dtype)
    true_dist = onehot * confidence + (1.0 - onehot) * low
    nll = -(true_dist * logp).sum(axis=-1)
    mask = (targets != pad_id).astype(nll.dtype)
    denom = jnp.maximum(mask.sum(), 1.0)
    return (nll * mask).sum() / denom


def mixup_style_target(coeff: jnp.ndarray, missing_style: int) -> jnp.ndarray:
    """3-way mixup target distribution for the style-classifier loss
    (hypernet_attention.py:174-179): styles [factual, humour, romantic];
    the missing style gets 0, the other two get coeff / 1-coeff."""
    zero = jnp.zeros_like(coeff)
    rows = jnp.stack([
        jnp.stack([zero, coeff, 1 - coeff]),
        jnp.stack([coeff, zero, 1 - coeff]),
        jnp.stack([coeff, 1 - coeff, zero]),
    ])
    return rows[missing_style]
