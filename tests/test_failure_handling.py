"""Failure containment: non-finite-gradient skipping and resume."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from captionax.train.state import (
    create_train_state,
    get_lr,
    make_optimizer,
)


class TestApplyIfFinite:
    def test_nan_grad_skipped(self):
        params = {"w": jnp.ones((4,))}
        tx = make_optimizer(1e-1)
        state = create_train_state(params, tx)

        good = {"w": jnp.ones((4,))}
        state2 = state.apply_gradients(good, tx)
        assert not np.allclose(np.asarray(state2.params["w"]), 1.0)

        bad = {"w": jnp.full((4,), jnp.nan)}
        state3 = state2.apply_gradients(bad, tx)
        np.testing.assert_array_equal(
            np.asarray(state3.params["w"]), np.asarray(state2.params["w"])
        )
        assert bool(jnp.isfinite(state3.params["w"]).all())

    def test_lr_still_injectable(self):
        params = {"w": jnp.ones((4,))}
        tx = make_optimizer(1e-1)
        state = create_train_state(params, tx)
        assert get_lr(state) == pytest.approx(1e-1)


class TestResume:
    def test_maybe_resume_roundtrip(self, tmp_path):
        from captionax.core.config import TrainConfig
        from captionax.models import decoder as dec
        from captionax.train.checkpoint import save_checkpoint
        from captionax.train.harness import CaptionTrainer
        from tests.test_harness import FakeVocab

        params = dec.attention_gru_init(jax.random.PRNGKey(0), 24, 12, 12, 12, 37)
        cfg = TrainConfig(checkpoint_dir=str(tmp_path))
        trainer = CaptionTrainer(params, "gru", cfg, FakeVocab(37), run_name="r")
        assert not trainer.maybe_resume()  # nothing saved yet

        modified = jax.tree_util.tree_map(lambda x: x + 1.0, params)
        save_checkpoint(str(tmp_path), 42, modified)
        assert trainer.maybe_resume()
        assert trainer.global_step == 42
        np.testing.assert_allclose(
            np.asarray(trainer.params["embed"]),
            np.asarray(modified["embed"]),
        )


class TestFullStateCheckpoint:
    def test_opt_state_roundtrip(self, tmp_path):
        from captionax.train.checkpoint import (
            restore_train_state,
            save_train_state,
        )

        params = {"w": jnp.ones((4,))}
        tx = make_optimizer(1e-2)
        state = create_train_state(params, tx)
        state = state.apply_gradients({"w": jnp.ones((4,))}, tx)
        save_train_state(str(tmp_path), 1, state)
        back = restore_train_state(str(tmp_path), create_train_state(params, tx))
        for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                        jax.tree_util.tree_leaves(back.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(back.step) == 1

    def test_interrupted_training_continues_bit_exact(self, tmp_path):
        """The Lightning-checkpoint contract the reference relies on:
        train k steps, checkpoint, restore into a FRESH process-alike
        state, train N-k more — params must be bit-identical to N
        uninterrupted steps (Adam moments + step counter carried)."""
        from captionax.models import decoder as dec
        from captionax.train.checkpoint import (
            restore_train_state,
            save_train_state,
        )
        from captionax.train.steps import make_gru_steps

        params = dec.attention_gru_init(
            jax.random.PRNGKey(0), 24, 12, 12, 12, 37
        )
        tx = make_optimizer(1e-2)
        step, _ = make_gru_steps(tx)
        step = jax.jit(step)

        def batch(i):
            k = jax.random.PRNGKey(100 + i)
            return {
                "features": jax.random.normal(k, (4, 7, 24)),
                "captions": jax.random.randint(k, (4, 9), 1, 37),
            }

        straight = create_train_state(params, tx)
        for i in range(6):
            straight, _ = step(straight, batch(i))

        part = create_train_state(params, tx)
        for i in range(3):
            part, _ = step(part, batch(i))
        save_train_state(str(tmp_path), 3, part)

        resumed = restore_train_state(
            str(tmp_path),
            create_train_state(
                dec.attention_gru_init(jax.random.PRNGKey(9), 24, 12, 12,
                                       12, 37),  # fresh like-tree
                tx,
            ),
        )
        for i in range(3, 6):
            resumed, _ = step(resumed, batch(i))

        for a, b in zip(jax.tree_util.tree_leaves(straight.params),
                        jax.tree_util.tree_leaves(resumed.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(resumed.step) == int(straight.step) == 6
