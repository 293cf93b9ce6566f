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
