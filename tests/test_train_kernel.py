"""Fused TF-recurrence TRAIN kernel vs the lax.scan path: forward
values and EVERY gradient (decoder tensors, theta, features) must match
jax.grad of the scan implementation — the same scan-vs-kernel equality
discipline as tests/test_decode_kernel.py, applied to training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from captionax.models import decoder as dec
from captionax.ops.train_kernel import fused_teacher_forced_hidden

DIMS = dict(nf=32, f=16, e=16, h=16, v=128)


def _make(seed=0, batch=12, regions=5, T=7):
    d = DIMS
    params = dec.attention_gru_init(
        jax.random.PRNGKey(seed), d["nf"], d["f"], d["e"], d["h"], d["v"])
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed + 100))
    feats = jax.random.normal(k1, (batch, regions, d["nf"]))
    caps = jax.random.randint(k2, (batch, T), 0, d["v"])
    return params, feats, caps


def _scan_hs(params, feats, caps, theta=None):
    return dec.teacher_forced_hidden(params, feats, caps,
                                     gru_params=theta)[0]


def _kernel_hs(params, feats, caps, theta=None):
    return fused_teacher_forced_hidden(
        params, feats, caps, gru_params=theta,
        block_rows=8, bwd_block_rows=4, interpret=True)[0]


class TestForward:
    def test_values_match_scan(self):
        params, feats, caps = _make()
        np.testing.assert_allclose(
            np.asarray(_kernel_hs(params, feats, caps)),
            np.asarray(_scan_hs(params, feats, caps)),
            rtol=1e-5, atol=1e-5)

    def test_theta_override(self):
        params, feats, caps = _make()
        theta = dec.attention_gru_init(
            jax.random.PRNGKey(9), DIMS["nf"], DIMS["f"], DIMS["e"],
            DIMS["h"], DIMS["v"])["gru"]
        np.testing.assert_allclose(
            np.asarray(_kernel_hs(params, feats, caps, theta)),
            np.asarray(_scan_hs(params, feats, caps, theta)),
            rtol=1e-5, atol=1e-5)

    def test_row_padding(self):
        # batch not a multiple of block_rows: padded rows must not
        # perturb real rows
        params, feats, caps = _make(batch=10)
        np.testing.assert_allclose(
            np.asarray(_kernel_hs(params, feats, caps)),
            np.asarray(_scan_hs(params, feats, caps)),
            rtol=1e-5, atol=1e-5)


class TestGradients:
    def _grads(self, impl, params, feats, caps, theta):
        def loss(p, th, f):
            hs = impl(p, f, caps, th)
            # CE-like reduction touching every hs element asymmetrically
            w = jnp.arange(hs.size, dtype=jnp.float32).reshape(hs.shape)
            return jnp.sum(jnp.tanh(hs) * w) / hs.size

        return jax.grad(loss, argnums=(0, 1, 2))(params, theta, feats)

    def test_all_grads_match_scan(self):
        params, feats, caps = _make()
        theta = dec.attention_gru_init(
            jax.random.PRNGKey(9), DIMS["nf"], DIMS["f"], DIMS["e"],
            DIMS["h"], DIMS["v"])["gru"]
        g_scan = self._grads(_scan_hs, params, feats, caps, theta)
        g_kern = self._grads(_kernel_hs, params, feats, caps, theta)
        flat_s, tree_s = jax.tree_util.tree_flatten_with_path(g_scan)
        flat_k, _ = jax.tree_util.tree_flatten_with_path(g_kern)
        assert len(flat_s) == len(flat_k)
        for (path, a), (_, b) in zip(flat_s, flat_k):
            name = jax.tree_util.keystr(path)
            scale = max(float(np.abs(np.asarray(a)).max()), 1e-3)
            # atol floor 1e-6: v_a's bias grad is EXACTLY 0 in the
            # kernel (softmax shift invariance) while the scan emits
            # ~1e-7 float noise for it
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-4,
                atol=max(2e-5 * scale, 1e-6),
                err_msg=f"grad mismatch at {name}")

    def test_padded_batch_grads(self):
        params, feats, caps = _make(batch=10)
        theta = params["gru"]
        g_scan = self._grads(_scan_hs, params, feats, caps, theta)
        g_kern = self._grads(_kernel_hs, params, feats, caps, theta)
        for a, b in zip(jax.tree_util.tree_leaves(g_scan),
                        jax.tree_util.tree_leaves(g_kern)):
            scale = max(float(np.abs(np.asarray(a)).max()), 1e-3)
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4,
                                       atol=max(2e-5 * scale, 1e-6))
