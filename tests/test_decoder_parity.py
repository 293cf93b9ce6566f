"""Token-level parity of captionax decoder math vs PyTorch semantics.

The reference decoder is torch ops (nn.GRUCell / LSTMCell + Bahdanau
attention, /root/reference/models/decoderlstm.py, models/attention.py).
We build the same computation with raw torch here as the oracle, copy the
weights into captionax pytrees, and require near-bitwise agreement.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
torch.manual_seed(0)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from captionax.models import decoder as dec  # noqa: E402
from captionax.models.attention import bahdanau_attention  # noqa: E402
from captionax.models.rnn import gru_cell, lstm_cell  # noqa: E402

B, R, NF, F, E, H, V, T = 3, 49, 64, 20, 20, 20, 37, 7


def t2j(t):
    return jnp.asarray(t.detach().numpy() if hasattr(t, "detach") else t)


def lin_params(torch_linear):
    return {"w": t2j(torch_linear.weight).T, "b": t2j(torch_linear.bias)}


class TestCells:
    def test_gru_cell_matches_torch(self):
        cell = torch.nn.GRUCell(E + F, H)
        params = {
            "w_ih": t2j(cell.weight_ih),
            "w_hh": t2j(cell.weight_hh),
            "b_ih": t2j(cell.bias_ih),
            "b_hh": t2j(cell.bias_hh),
        }
        x = torch.randn(B, E + F)
        h = torch.randn(B, H)
        ref = cell(x, h).detach().numpy()
        out = np.asarray(gru_cell(params, t2j(x), t2j(h)))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_lstm_cell_matches_torch(self):
        cell = torch.nn.LSTMCell(E, H)
        params = {
            "w_ih": t2j(cell.weight_ih),
            "w_hh": t2j(cell.weight_hh),
            "b_ih": t2j(cell.bias_ih),
            "b_hh": t2j(cell.bias_hh),
        }
        x = torch.randn(B, E)
        h, c = torch.randn(B, H), torch.randn(B, H)
        rh, rc = cell(x, (h, c))
        oh, oc = lstm_cell(params, t2j(x), (t2j(h), t2j(c)))
        np.testing.assert_allclose(np.asarray(oh), rh.detach().numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(oc), rc.detach().numpy(), atol=1e-5)


def build_torch_attention_gru():
    """The reference AttentionGru computation, assembled from raw torch."""
    m = torch.nn.Module()
    m.ff1 = torch.nn.Linear(NF, F)
    m.ff2 = torch.nn.Linear(F, F)
    m.embed = torch.nn.Embedding(V, E)
    m.gru = torch.nn.GRUCell(E + F, H)
    m.fc = torch.nn.Linear(H, V)
    m.W_a = torch.nn.Linear(F, H)
    m.U_a = torch.nn.Linear(H, H)
    m.v_a = torch.nn.Linear(H, 1)
    m.init_h = torch.nn.Linear(F, H)
    return m


def torch_attention(m, feats, h):
    a = torch.tanh(m.W_a(feats) + m.U_a(h).unsqueeze(1))
    w = torch.softmax(m.v_a(a), dim=1)
    ctx = (w * feats).sum(dim=1)
    return ctx, w.squeeze(2)


def torch_teacher_forced(m, raw_feats, captions):
    """Reference AttentionGru.forward with sample_prob=0
    (decoderlstm.py:49-120): zeroed embed at t=0, embed[t-1] after."""
    feats = m.ff2(torch.relu(m.ff1(raw_feats)))
    embed = m.embed(captions)
    h = m.init_h(feats.mean(dim=1))
    outputs, attns = [], []
    for t in range(captions.shape[1]):
        if t == 0:
            word_embed = torch.zeros_like(embed[:, 0, :])
        else:
            word_embed = embed[:, t - 1, :]
        ctx, aw = torch_attention(m, feats, h)
        h = m.gru(torch.cat([word_embed, ctx], dim=1), h)
        out = m.fc(h)
        outputs.append(out)
        attns.append(aw)
    return torch.stack(outputs, 1), torch.stack(attns, 1)


def copy_params(m):
    return {
        "feature_fc": {"l0": lin_params(m.ff1), "l1": lin_params(m.ff2)},
        "embed": t2j(m.embed.weight),
        "gru": {
            "w_ih": t2j(m.gru.weight_ih),
            "w_hh": t2j(m.gru.weight_hh),
            "b_ih": t2j(m.gru.bias_ih),
            "b_hh": t2j(m.gru.bias_hh),
        },
        "fc": lin_params(m.fc),
        "attention": {
            "W_a": lin_params(m.W_a),
            "U_a": lin_params(m.U_a),
            "v_a": lin_params(m.v_a),
        },
        "init_h": lin_params(m.init_h),
    }


class TestAttentionGruParity:
    def setup_method(self):
        self.m = build_torch_attention_gru()
        self.params = copy_params(self.m)
        self.raw = torch.randn(B, R, NF)
        self.caps = torch.randint(0, V, (B, T))

    def test_attention_matches(self):
        feats = self.m.ff2(torch.relu(self.m.ff1(self.raw)))
        h = torch.randn(B, H)
        ref_ctx, ref_w = torch_attention(self.m, feats, h)
        ctx, w = bahdanau_attention(
            self.params["attention"], t2j(feats), t2j(h)
        )
        np.testing.assert_allclose(np.asarray(ctx), ref_ctx.detach().numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(w), ref_w.detach().numpy(), atol=1e-5)

    def test_teacher_forced_token_parity(self):
        ref_logits, ref_attn = torch_teacher_forced(self.m, self.raw, self.caps)
        logits, attn = dec.teacher_forced(
            self.params, t2j(self.raw), t2j(self.caps.numpy())
        )
        np.testing.assert_allclose(
            np.asarray(logits), ref_logits.detach().numpy(), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(attn), ref_attn.detach().numpy(), atol=1e-4
        )
        # token-level: argmax sequences identical
        assert (
            np.asarray(logits).argmax(-1) == ref_logits.detach().numpy().argmax(-1)
        ).all()

    def test_jit_and_grad(self):
        """The TF pass must be jittable and differentiable end-to-end."""
        raw = t2j(self.raw)
        caps = t2j(self.caps.numpy())

        @jax.jit
        def loss_fn(params):
            logits, _ = dec.teacher_forced(params, raw, caps)
            return jnp.mean(
                -jax.nn.log_softmax(logits)[
                    jnp.arange(B)[:, None], jnp.arange(T)[None], caps
                ]
            )

        g = jax.grad(loss_fn)(self.params)
        gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
        assert np.isfinite(gnorm) and gnorm > 0

    def test_hypernet_hook_overrides_gru(self):
        """decode with gru_params override must differ from baked-in gru."""
        other = jax.tree_util.tree_map(lambda x: x + 0.1, self.params["gru"])
        l1, _ = dec.teacher_forced(self.params, t2j(self.raw), t2j(self.caps.numpy()))
        l2, _ = dec.teacher_forced(
            self.params, t2j(self.raw), t2j(self.caps.numpy()), gru_params=other
        )
        assert not np.allclose(np.asarray(l1), np.asarray(l2))


class TestMultiLayer:
    def test_extra_layers_change_output(self):
        key = jax.random.PRNGKey(0)
        p1 = dec.attention_gru_init(key, NF, F, E, H, V, num_layers=1)
        p2 = dec.attention_gru_init(key, NF, F, E, H, V, num_layers=2)
        raw = jax.random.normal(jax.random.PRNGKey(1), (B, R, NF))
        caps = jax.random.randint(jax.random.PRNGKey(2), (B, T), 0, V)
        l1, _ = dec.teacher_forced(p1, raw, caps)
        l2, _ = dec.teacher_forced(p2, raw, caps)
        assert l1.shape == l2.shape == (B, T, V)
        assert not np.allclose(np.asarray(l1), np.asarray(l2))
