"""Train state, optimizer, and plateau LR scheduling.

Optimizer parity with the reference trainers: Adam at a per-script LR,
global-norm gradient clipping at 5.0 (pl.Trainer gradient_clip_val=5.,
/root/reference/train_attention_gru.py:339), and
ReduceLROnPlateau(cooldown=2, factor=0.5) stepped per epoch on the
teacher-forced validation loss (hypernet_attention.py:131-133).

The LR is injected as an optax hyperparameter so the host-side
:class:`PlateauScheduler` can rescale it between epochs without
recompiling the jitted step.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray

    def apply_gradients(self, grads, tx) -> "TrainState":
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        return TrainState(
            optax.apply_updates(self.params, updates), new_opt, self.step + 1
        )


def make_optimizer(learning_rate: float = 5e-3, clip_norm: float = 5.0,
                   skip_nonfinite: bool = True):
    """Adam + global-norm clip with an injectable learning rate.

    ``skip_nonfinite`` wraps the update in ``optax.apply_if_finite`` so a
    NaN/inf gradient step is dropped (parameters and moments untouched)
    instead of poisoning training — failure containment the reference
    lacks entirely (SURVEY.md §5)."""

    def build(learning_rate):
        tx = optax.chain(
            optax.clip_by_global_norm(clip_norm),
            optax.adam(learning_rate),
        )
        if skip_nonfinite:
            tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
        return tx

    return optax.inject_hyperparams(build)(learning_rate=learning_rate)


def create_train_state(params, tx, step: int = 0) -> TrainState:
    return TrainState(params, tx.init(params), jnp.asarray(step, jnp.int32))


def get_lr(state: TrainState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


def set_lr(state: TrainState, lr: float) -> TrainState:
    hp = dict(state.opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state._replace(opt_state=state.opt_state._replace(hyperparams=hp))


def suggest_lr_from_sweep(lrs, losses, skip_begin: int = 10,
                          skip_end: int = 1) -> Optional[float]:
    """Pick the LR at the steepest descent of the smoothed loss curve —
    the pl.Trainer ``auto_lr_find`` suggestion rule
    (/root/reference/train_attention_gru.py:330-342 relies on
    trainer.tune's exponential LR sweep; this reproduces the Lightning
    LRFinder.suggestion() policy: argmin of the loss gradient over the
    swept window, edges skipped)."""
    import numpy as np

    lrs = np.asarray(lrs, np.float64)
    losses = np.asarray(losses, np.float64)
    finite = np.isfinite(losses)
    if finite.sum() < max(skip_begin + skip_end + 2, 4):
        # sweep diverged almost immediately; fall back to the smallest
        # finite-loss lr scaled down, or None if nothing is usable
        return float(lrs[finite][-1] / 10.0) if finite.any() else None
    lo = min(skip_begin, max(0, finite.sum() - 3))
    hi = len(losses) - skip_end
    seg = losses[lo:hi]
    seg_lrs = lrs[lo:hi]
    good = np.isfinite(seg)
    grad = np.gradient(np.where(good, seg, np.nanmax(seg[good])))
    grad[~good] = np.inf
    return float(seg_lrs[int(np.argmin(grad))])


class PlateauScheduler:
    """torch ReduceLROnPlateau semantics (mode=min, the defaults the
    reference relies on): patience epochs without improvement halves the
    LR, then a cooldown window suppresses further reductions."""

    def __init__(
        self,
        factor: float = 0.5,
        patience: int = 10,
        cooldown: int = 2,
        threshold: float = 1e-4,
        min_lr: float = 0.0,
    ):
        self.factor = factor
        self.patience = patience
        self.cooldown = cooldown
        self.threshold = threshold
        self.min_lr = min_lr
        self.best: Optional[float] = None
        self.bad_epochs = 0
        self.cooldown_left = 0

    def step(self, metric: float, lr: float) -> float:
        """Feed the epoch's monitored metric; returns (possibly reduced) lr."""
        if self.best is None or metric < self.best * (1 - self.threshold):
            self.best = metric
            self.bad_epochs = 0
        elif self.cooldown_left > 0:
            self.cooldown_left -= 1
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                lr = max(lr * self.factor, self.min_lr)
                self.cooldown_left = self.cooldown
                self.bad_epochs = 0
        return lr
