"""Hypernet synthesis + training-step tests, incl. 8-device data parallel."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from captionax.models import decoder as dec
from captionax.models.hypernet import (
    hypernet_apply,
    hypernet_init,
    theta_param_count,
)
from captionax.train.state import create_train_state, get_lr, make_optimizer, set_lr
from captionax.train.steps import (
    jit_data_parallel,
    make_gru_steps,
    make_hypernet_steps,
    synthesize_theta,
    synthesize_theta_batched,
)

NF, F, E, H, V = 32, 16, 16, 16, 29
B, R, T = 8, 9, 6


def make_batch(key, with_style=True):
    k1, k2 = jax.random.split(key)
    batch = {
        "features": jax.random.normal(k1, (B, R, NF)),
        "captions": jax.random.randint(k2, (B, T), 1, V),
    }
    if with_style:
        batch["style_id"] = jnp.asarray(4, jnp.int32)  # 'factual'
    return batch


@pytest.fixture(scope="module")
def model():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    decoder = dec.attention_gru_init(k1, NF, F, E, H, V)
    hn = hypernet_init(k2, hyper_emb=E, input_dim=E + F, hidden_dim=H)
    return {"decoder": decoder, "hn": hn}


class TestSynthesis:
    def test_reference_theta_count(self):
        # 200/200/200 config generates 361,200 weights (SURVEY.md §2.4)
        assert theta_param_count(400, 200) == 361200

    def test_theta_shapes_match_cell(self, model):
        theta = hypernet_apply(model["hn"], jnp.ones((E,)))
        assert theta["w_ih"].shape == (3 * H, E + F)
        assert theta["w_hh"].shape == (3 * H, H)
        assert theta["b_ih"].shape == theta["b_hh"].shape == (3 * H,)

    def test_styles_give_different_weights(self, model):
        e1 = jnp.zeros((E,)).at[0].set(1.0)
        e2 = jnp.zeros((E,)).at[1].set(1.0)
        t1 = hypernet_apply(model["hn"], e1)
        t2 = hypernet_apply(model["hn"], e2)
        assert not np.allclose(np.asarray(t1["w_ih"]), np.asarray(t2["w_ih"]))

    def test_batched_synthesis_matches_loop(self, model):
        embeds = jax.random.normal(jax.random.PRNGKey(1), (4, E))
        batched = synthesize_theta_batched(model, embeds)
        for i in range(4):
            single = hypernet_apply(model["hn"], embeds[i])
            for k in single:
                np.testing.assert_allclose(
                    np.asarray(batched[k][i]), np.asarray(single[k]), atol=1e-6
                )

    def test_mixed_style_decode_matches_per_style(self, model):
        """Per-row theta through the decoder == running each style alone."""
        batch = make_batch(jax.random.PRNGKey(2), with_style=False)
        embeds = jax.random.normal(jax.random.PRNGKey(3), (B, E))
        theta_b = synthesize_theta_batched(model, embeds)
        logits_b, _ = dec.teacher_forced(
            model["decoder"], batch["features"], batch["captions"], gru_params=theta_b
        )
        for i in [0, B - 1]:
            theta_i = hypernet_apply(model["hn"], embeds[i])
            logits_i, _ = dec.teacher_forced(
                model["decoder"],
                batch["features"][i : i + 1],
                batch["captions"][i : i + 1],
                gru_params=theta_i,
            )
            np.testing.assert_allclose(
                np.asarray(logits_b[i]), np.asarray(logits_i[0]), atol=1e-4
            )


class TestDedicatedStyleTokens:
    """Opt-in deviation (ModelConfig.dedicated_style_tokens): style
    conditioning from a 3-row table instead of the vocab token row,
    fixing the reference's 'humour'-><unk> pollution
    (hypernet_attention.py:139-142 with build_vocab lacking 'humour')."""

    @pytest.fixture()
    def ded_model(self, model):
        from captionax.models.layers import embedding_init

        m = {k: jax.tree_util.tree_map(jnp.array, v) for k, v in model.items()}
        m["style_embed"] = embedding_init(jax.random.PRNGKey(9), 3, E)
        return m

    def test_synthesize_theta_uses_table_iff_present(self, ded_model, model):
        from captionax.train.steps import style_table

        th = synthesize_theta(ded_model, jnp.int32(1))
        ref = hypernet_apply(ded_model["hn"], ded_model["style_embed"][1])
        np.testing.assert_allclose(
            np.asarray(th["w_ih"]), np.asarray(ref["w_ih"]), atol=1e-6
        )
        assert style_table(model) is model["decoder"]["embed"]
        base = synthesize_theta(model, jnp.int32(1))
        vocab_row = hypernet_apply(model["hn"], model["decoder"]["embed"][1])
        np.testing.assert_allclose(
            np.asarray(base["w_ih"]), np.asarray(vocab_row["w_ih"]), atol=1e-6
        )

    def test_resolve_style_id(self, ded_model, model):
        from captionax.train.steps import resolve_style_id

        vocab = {"factual": 4, "humour": 3, "romantic": 6}.__getitem__
        assert resolve_style_id(ded_model, vocab, "factual") == 0
        assert resolve_style_id(ded_model, vocab, "humour") == 1
        assert resolve_style_id(ded_model, vocab, "romantic") == 2
        assert resolve_style_id(model, vocab, "humour") == 3  # <unk> quirk

    def test_train_updates_only_selected_style_row(self, ded_model):
        from captionax.train.steps import dedicated_style_embed

        tx = make_optimizer(1e-2)
        state = create_train_state(ded_model, tx)
        train, _ = make_hypernet_steps(tx, embed_fn=dedicated_style_embed)
        train = jax.jit(train)
        batch = make_batch(jax.random.PRNGKey(11))
        batch["style_id"] = jnp.asarray(1, jnp.int32)  # humour
        before = np.asarray(state.params["style_embed"])
        state, m0 = train(state, batch)
        for _ in range(20):
            state, m = train(state, batch)
        after = np.asarray(state.params["style_embed"])
        assert float(m["train_loss"]) < float(m0["train_loss"]) * 0.8
        assert not np.allclose(before[1], after[1])  # trained row moved
        np.testing.assert_array_equal(before[0], after[0])
        np.testing.assert_array_equal(before[2], after[2])

    def test_mixup_step_mixes_table_rows(self, ded_model):
        from captionax.models.classifiers import small_style_classifier_init
        from captionax.train.steps import (
            dedicated_style_embed,
            make_hypernet_mixup_steps,
        )

        clf = small_style_classifier_init(jax.random.PRNGKey(12), V, E, 3)
        tx = make_optimizer(1e-3)
        state = create_train_state(ded_model, tx)
        step = jax.jit(make_hypernet_mixup_steps(
            tx, clf, style_ids=(0, 1, 2), embed_fn=dedicated_style_embed
        ))
        batch = make_batch(jax.random.PRNGKey(13))
        batch["style_id"] = jnp.asarray(0, jnp.int32)
        for i in range(3):
            state, m = step(state, batch, jax.random.PRNGKey(i))
            assert np.isfinite(float(m["train_loss"]))
            assert np.isfinite(float(m["style_loss"]))

    def test_mixup_split_matches_fused_gradient(self, ded_model):
        """split=True computes the mixup gradient as two dispatches;
        by linearity the resulting params must match the fused graph
        (the split exists because the fused graph wedges the relay's
        AOT compile helper at production dims — CLAUDE.md)."""
        from captionax.models.classifiers import small_style_classifier_init
        from captionax.train.steps import (
            dedicated_style_embed,
            make_hypernet_mixup_steps,
        )

        clf = small_style_classifier_init(jax.random.PRNGKey(12), V, E, 3)
        tx = make_optimizer(1e-3)
        kw = dict(style_ids=(0, 1, 2), embed_fn=dedicated_style_embed)
        fused = jax.jit(make_hypernet_mixup_steps(tx, clf, **kw))
        split = make_hypernet_mixup_steps(tx, clf, split=True, **kw)
        assert getattr(split, "_prejitted", False)

        batch = make_batch(jax.random.PRNGKey(13))
        batch["style_id"] = jnp.asarray(0, jnp.int32)
        s_f = create_train_state(ded_model, tx)
        s_s = create_train_state(ded_model, tx)
        for i in range(3):
            rng = jax.random.PRNGKey(i)
            s_f, m_f = fused(s_f, batch, rng)
            s_s, m_s = split(s_s, batch, rng)
            np.testing.assert_allclose(float(m_f["ce_loss"]),
                                       float(m_s["ce_loss"]), rtol=1e-5)
            np.testing.assert_allclose(float(m_f["style_loss"]),
                                       float(m_s["style_loss"]), rtol=1e-4)
        flat_f = jax.tree_util.tree_leaves(s_f.params)
        flat_s = jax.tree_util.tree_leaves(s_s.params)
        for a, b in zip(flat_f, flat_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-6)


class TestStyleAux:
    """Style-identification auxiliary loss (captionax extension,
    steps.make_hypernet_styleaux_steps): free-run under the batch's own
    theta, a frozen classifier must recognize the style."""

    @pytest.fixture()
    def ded_model(self, model):
        from captionax.models.layers import embedding_init

        m = {k: jax.tree_util.tree_map(jnp.array, v) for k, v in model.items()}
        m["style_embed"] = embedding_init(jax.random.PRNGKey(9), 3, E)
        return m

    def test_aux_loss_decreases(self, ded_model):
        """Training against a FIXED random classifier drives the aux
        term down: the hypernet learns to emit theta whose free-running
        output the classifier maps to the style's class."""
        from captionax.models.classifiers import small_style_classifier_init
        from captionax.train.steps import (
            dedicated_style_embed,
            make_hypernet_styleaux_steps,
        )

        clf = small_style_classifier_init(jax.random.PRNGKey(12), V, E, 3)
        tx = make_optimizer(1e-2)
        state = create_train_state(ded_model, tx)
        step = jax.jit(make_hypernet_styleaux_steps(
            tx, clf, alpha=0.1, style_ids=(0, 1, 2),
            embed_fn=dedicated_style_embed,
        ))
        batch = make_batch(jax.random.PRNGKey(13))
        batch["style_id"] = jnp.asarray(2, jnp.int32)  # romantic
        rng = jax.random.PRNGKey(0)
        state, m0 = step(state, batch, rng)
        for _ in range(60):
            state, m = step(state, batch, rng)
        assert np.isfinite(float(m["train_loss"]))
        # the frozen random classifier bounds how low the CE can go; a
        # steady >=10% drop shows the aux gradient reaches the hypernet
        # (measured ~20% at this budget; the margin absorbs seed drift)
        assert float(m["style_loss"]) < float(m0["style_loss"]) * 0.9

    def test_styleaux_split_matches_fused_gradient(self, ded_model):
        """split=True computes the same total gradient as two dispatches
        (exact by linearity) — the relay workaround contract shared with
        make_hypernet_mixup_steps."""
        from captionax.models.classifiers import small_style_classifier_init
        from captionax.train.steps import (
            dedicated_style_embed,
            make_hypernet_styleaux_steps,
        )

        clf = small_style_classifier_init(jax.random.PRNGKey(12), V, E, 3)
        tx = make_optimizer(1e-3)
        kw = dict(style_ids=(0, 1, 2), embed_fn=dedicated_style_embed)
        fused = jax.jit(make_hypernet_styleaux_steps(tx, clf, **kw))
        split = make_hypernet_styleaux_steps(tx, clf, split=True, **kw)
        assert getattr(split, "_prejitted", False)

        batch = make_batch(jax.random.PRNGKey(13))
        batch["style_id"] = jnp.asarray(1, jnp.int32)
        s_f = create_train_state(ded_model, tx)
        s_s = create_train_state(ded_model, tx)
        for i in range(3):
            rng = jax.random.PRNGKey(i)
            s_f, m_f = fused(s_f, batch, rng)
            s_s, m_s = split(s_s, batch, rng)
            np.testing.assert_allclose(float(m_f["ce_loss"]),
                                       float(m_s["ce_loss"]), rtol=1e-5)
            np.testing.assert_allclose(float(m_f["style_loss"]),
                                       float(m_s["style_loss"]), rtol=1e-4)
        flat_f = jax.tree_util.tree_leaves(s_f.params)
        flat_s = jax.tree_util.tree_leaves(s_s.params)
        # looser than the mixup twin: the fused graph CSEs the theta
        # synthesis across the CE/aux branches (the split cannot), and
        # Adam's rsqrt amplifies that reassociation-level drift
        for a, b in zip(flat_f, flat_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-5)

    def test_vocab_style_ids_class_mapping(self, model):
        """With reference conditioning the class index comes from the
        (4, 3, 6) vocab mapping — humour's <unk>=3 must map to class 1."""
        from captionax.models.classifiers import small_style_classifier_init
        from captionax.train.steps import make_hypernet_styleaux_steps

        clf = small_style_classifier_init(jax.random.PRNGKey(12), V, E, 3)
        tx = make_optimizer(1e-3)
        state = create_train_state(model, tx)
        step = jax.jit(make_hypernet_styleaux_steps(tx, clf))
        batch = make_batch(jax.random.PRNGKey(14))
        batch["style_id"] = jnp.asarray(3, jnp.int32)  # humour -> <unk>
        state, m = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(m["train_loss"]))
        assert np.isfinite(float(m["style_loss"]))

    def test_harness_rejects_both_aux_objectives(self, ded_model, tmp_path):
        from captionax.core.config import TrainConfig
        from captionax.train.harness import CaptionTrainer

        cfg = TrainConfig(mixup=True, style_aux=True,
                          checkpoint_dir=str(tmp_path))
        with pytest.raises(ValueError, match="at most one"):
            CaptionTrainer(ded_model, "hypernet", cfg, vocab=None,
                           style_classifier_params={})


class TestTrainSteps:
    def test_gru_overfit_one_batch(self, model):
        tx = make_optimizer(1e-2)
        state = create_train_state(model["decoder"], tx)
        train, _ = make_gru_steps(tx)
        train = jax.jit(train)
        batch = make_batch(jax.random.PRNGKey(4), with_style=False)
        state, m0 = train(state, batch)
        for _ in range(40):
            state, m = train(state, batch)
        assert float(m["train_loss"]) < float(m0["train_loss"]) * 0.5

    def test_hypernet_overfit_one_batch(self, model):
        tx = make_optimizer(1e-2)
        state = create_train_state(model, tx)
        train, _ = make_hypernet_steps(tx)
        train = jax.jit(train)
        batch = make_batch(jax.random.PRNGKey(5))
        state, m0 = train(state, batch)
        for _ in range(40):
            state, m = train(state, batch)
        assert float(m["train_loss"]) < float(m0["train_loss"]) * 0.5

    def test_decoder_gru_params_frozen_in_hypernet_mode(self, model):
        """Reference parameter split: the captioner's own GRU tensors are
        not in the optimizer (hypernet_attention.py:123-133) — here they
        simply receive zero gradient and never move."""
        tx = make_optimizer(1e-2)
        state = create_train_state(model, tx)
        train, _ = make_hypernet_steps(tx)
        before = jax.tree_util.tree_map(np.asarray, state.params["decoder"]["gru"])
        state, _ = jax.jit(train)(state, make_batch(jax.random.PRNGKey(6)))
        after = state.params["decoder"]["gru"]
        for k in before:
            np.testing.assert_array_equal(before[k], np.asarray(after[k]))

    def test_eval_step_losses(self, model):
        tx = make_optimizer(1e-2)
        _, eval_step = make_hypernet_steps(tx)
        out = jax.jit(eval_step)(model, make_batch(jax.random.PRNGKey(7)))
        assert np.isfinite(float(out["val_loss_tf"]))
        assert np.isfinite(float(out["val_loss"]))

    def test_plateau_lr(self, model):
        from captionax.train.state import PlateauScheduler

        tx = make_optimizer(1e-2)
        state = create_train_state(model, tx)
        sched = PlateauScheduler(factor=0.5, patience=1, cooldown=2)
        lr = get_lr(state)
        lr = sched.step(1.0, lr)   # best
        lr = sched.step(1.1, lr)   # bad 1
        lr = sched.step(1.2, lr)   # bad 2 > patience -> reduce
        assert lr == pytest.approx(5e-3)
        state = set_lr(state, lr)
        assert get_lr(state) == pytest.approx(5e-3)


class TestDataParallel:
    def test_eight_device_step_matches_single(self, model):
        assert len(jax.devices()) == 8
        from captionax.parallel.mesh import make_mesh, replicate_params, shard_batch

        mesh = make_mesh()
        tx = make_optimizer(1e-3)
        train, _ = make_hypernet_steps(tx)
        batch = make_batch(jax.random.PRNGKey(8))

        state1 = create_train_state(model, tx)
        state1, m1 = jax.jit(train, donate_argnums=())(state1, batch)

        state8 = create_train_state(replicate_params(mesh, model), tx)
        pstep = jit_data_parallel(train, mesh, batch, donate_state=False)
        state8, m8 = pstep(state8, shard_batch(mesh, batch))

        assert float(m1["train_loss"]) == pytest.approx(
            float(m8["train_loss"]), rel=1e-5
        )
        l1 = jax.tree_util.tree_leaves(state1.params)
        l8 = jax.tree_util.tree_leaves(state8.params)
        # cross-device psum reduction order differs from single-device sum;
        # adam's g/sqrt(v) normalization amplifies that to ~1e-4 on params
        for a, b in zip(l1, l8):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


class TestBf16Compute:
    """Opt-in mixed precision: bf16 decoder compute with f32 masters must
    track the f32 loss closely and keep params/grads finite."""

    def test_loss_close_and_trains(self, model):
        from captionax.train.state import create_train_state, make_optimizer
        from captionax.train.steps import make_hypernet_steps

        tx = make_optimizer(1e-3)
        batch = make_batch(jax.random.PRNGKey(3))
        step32, _ = make_hypernet_steps(tx)
        step16, _ = make_hypernet_steps(tx, bf16=True)

        s32 = create_train_state(jax.tree_util.tree_map(jnp.array, model), tx)
        s16 = create_train_state(jax.tree_util.tree_map(jnp.array, model), tx)
        losses32, losses16 = [], []
        for _ in range(5):
            s32, m32 = step32(s32, batch)
            s16, m16 = step16(s16, batch)
            losses32.append(float(m32["train_loss"]))
            losses16.append(float(m16["train_loss"]))
        assert all(np.isfinite(losses16))
        # same batch repeated: both must descend and stay close
        assert losses16[-1] < losses16[0]
        np.testing.assert_allclose(losses16, losses32, rtol=2e-2)
        # masters stay f32
        for leaf in jax.tree_util.tree_leaves(s16.params):
            assert leaf.dtype == jnp.float32

    def test_bf16_scheduled_sampling_traces(self, model):
        """Regression: the sampling-branch scan carry must adopt the bf16
        logits dtype (a hardcoded f32 init_logits fails to trace)."""
        from captionax.train.steps import _tf_logits

        batch = make_batch(jax.random.PRNGKey(4))
        logits = jax.jit(
            lambda p, b: _tf_logits(
                p["decoder"], b, sample_prob=0.5,
                rng=jax.random.PRNGKey(0), bf16=True,
            )
        )(model, batch)
        assert logits.dtype == jnp.float32
        assert np.all(np.isfinite(np.asarray(logits)))


class TestFusedCE:
    """fused_ce_from_hidden must equal CE over materialized logits in
    value and gradient, for every chunking (incl. row padding)."""

    def test_value_and_grad_parity(self, model):
        from captionax.models.layers import linear
        from captionax.train.losses import (
            cross_entropy_loss,
            fused_ce_from_hidden,
        )

        batch = make_batch(jax.random.PRNGKey(9))
        caps = batch["captions"].at[:, -2:].set(0)  # real pad positions
        hs, _ = dec.teacher_forced_hidden(
            model["decoder"], batch["features"], caps
        )
        ref = cross_entropy_loss(linear(model["decoder"]["fc"], hs), caps, 0)
        for chunk in (B * T, 16, 7):  # exact, divides, needs padding
            got = fused_ce_from_hidden(
                model["decoder"]["fc"], hs, caps, 0, chunk_rows=chunk
            )
            np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)

        g_ref = jax.grad(
            lambda fc, h: cross_entropy_loss(linear(fc, h), caps, 0),
            argnums=(0, 1),
        )(model["decoder"]["fc"], hs)
        g_got = jax.grad(
            lambda fc, h: fused_ce_from_hidden(fc, h, caps, 0, 7),
            argnums=(0, 1),
        )(model["decoder"]["fc"], hs)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_got)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            )

    def test_train_step_loss_matches_unfused(self, model):
        """The production (fused + remat) train step computes the same loss
        and moves params identically to an unfused value_and_grad step."""
        from captionax.models.layers import embedding
        from captionax.train.losses import cross_entropy_loss
        from captionax.train.steps import _tf_logits
        from captionax.models.hypernet import hypernet_apply

        tx = make_optimizer(1e-3)
        batch = make_batch(jax.random.PRNGKey(10))
        step, _ = make_hypernet_steps(tx)  # fused + remat defaults

        def unfused(p):
            th = hypernet_apply(
                p["hn"], embedding(p["decoder"]["embed"], batch["style_id"])
            )
            logits = _tf_logits(p["decoder"], batch, gru_params=th)
            return cross_entropy_loss(logits, batch["captions"], 0)

        s = create_train_state(jax.tree_util.tree_map(jnp.array, model), tx)
        ref_loss, ref_grads = jax.value_and_grad(unfused)(s.params)
        s2, m = step(s, batch)
        np.testing.assert_allclose(
            float(m["train_loss"]), float(ref_loss), rtol=1e-6
        )
        ref_after = s.apply_gradients(ref_grads, tx)
        # fused CE sums nll in chunk order; adam's g/sqrt(v) amplifies the
        # reduction-order noise to ~1e-4 on params (same bound as the
        # 8-device psum comparison above)
        for a, b in zip(
            jax.tree_util.tree_leaves(ref_after.params),
            jax.tree_util.tree_leaves(s2.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4
            )
