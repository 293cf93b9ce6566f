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
    logits: jnp.ndarray, targets: jnp.ndarray, pad_id: int = 0
) -> jnp.ndarray:
    """logits [..., V] float, targets [...] int.  Mean CE over non-pad."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = (targets != pad_id).astype(nll.dtype)
    denom = jnp.maximum(mask.sum(), 1.0)
    return (nll * mask).sum() / denom


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
