"""Checkpointing via Orbax + the reference's "module surgery" pattern.

Reference behavior (SURVEY.md §5): Lightning ModelCheckpoint keeps the
top-1 on 'val_loss with TF'; resume loads full checkpoints; and hypernet
training warm-starts by copying the shared submodules
(image_encoder/feature_fc/embed/fc/attention/init_h) from a pretrained
plain captioner (/root/reference/hypernet_attention.py:418-428,
train_attention_gru.py:311-320) — here :func:`graft_pretrained_captioner`.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _manager(directory: str, max_to_keep: int = 1):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        ),
    )


def save_checkpoint(directory: str, step: int, tree: Any,
                    max_to_keep: int = 1) -> None:
    import orbax.checkpoint as ocp

    mgr = _manager(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(tree))
    mgr.wait_until_finished()


def restore_checkpoint(directory: str, step: Optional[int] = None,
                       like: Any = None) -> Any:
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {directory}")
    if like is not None:
        ref = jax.tree_util.tree_map(
            lambda x: ocp.utils.to_shape_dtype_struct(x), like
        )
        return mgr.restore(step, args=ocp.args.StandardRestore(ref))
    return mgr.restore(step)


def latest_step(directory: str) -> Optional[int]:
    try:
        return _manager(directory).latest_step()
    except Exception:
        return None


def save_train_state(directory: str, step: int, state,
                     max_to_keep: int = 1) -> None:
    """Checkpoint the FULL TrainState (params + optimizer moments + step)
    so resume continues Adam exactly where it left off — the reference's
    Lightning checkpoints carry optimizer state too."""
    save_checkpoint(
        directory, step,
        {"params": state.params, "opt_state": state.opt_state,
         "step": state.step},
        max_to_keep,
    )


def restore_train_state(directory: str, like_state,
                        step: Optional[int] = None):
    """Restore a full TrainState saved by save_train_state."""
    tree = restore_checkpoint(
        directory, step,
        like={"params": like_state.params, "opt_state": like_state.opt_state,
              "step": like_state.step},
    )
    return like_state._replace(
        params=tree["params"], opt_state=tree["opt_state"], step=tree["step"]
    )


SHARED_SUBMODULES = ("feature_fc", "embed", "fc", "attention", "init_h")


def graft_pretrained_captioner(model_params, captioner_params):
    """Copy the shared decoder submodules from a pretrained plain
    captioner into a hypernet model's decoder (reference ckpt surgery)."""
    decoder = dict(model_params["decoder"])
    for name in SHARED_SUBMODULES:
        decoder[name] = captioner_params[name]
    out = dict(model_params)
    out["decoder"] = decoder
    return out


class BestCheckpointer:
    """ModelCheckpoint(save_top_k=1, monitor=min) equivalent."""

    def __init__(self, directory: str, max_to_keep: int = 1):
        self.directory = directory
        self.best: Optional[float] = None
        self.max_to_keep = max_to_keep

    def maybe_save(self, metric: float, step: int, tree: Any) -> bool:
        if self.best is None or metric < self.best:
            self.best = metric
            save_checkpoint(self.directory, step, tree, self.max_to_keep)
            return True
        return False
