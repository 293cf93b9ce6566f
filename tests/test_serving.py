"""Pipelined serving wrapper + profiler trace smoke (CPU)."""

import glob
import os

import numpy as np

import jax
import jax.numpy as jnp

from captionax.decode.serving import PipelinedDecoder, make_beam_server
from captionax.models import decoder as dec

NF, F, E, H, V, B, R = 24, 12, 12, 12, 37, 4, 9


class TestPipelinedDecoder:
    def test_order_and_completeness(self):
        calls = []

        @jax.jit
        def fn(x):
            return x * 2.0

        srv = PipelinedDecoder(fn)
        batches = [jnp.full((3,), float(i)) for i in range(5)]
        outs = list(srv.map(batches))
        assert len(outs) == 5
        for i, o in enumerate(outs):
            np.testing.assert_allclose(o, 2.0 * i)

    def test_beam_server_matches_direct(self):
        params = dec.attention_gru_init(jax.random.PRNGKey(0), NF, F, E, H, V)
        params["fc"]["b"] = params["fc"]["b"].at[2].add(1.0)
        feats = [jax.random.normal(jax.random.PRNGKey(i), (B, R, NF))
                 for i in range(3)]
        srv = make_beam_server(params, max_steps=10, use_fused=False)
        outs = list(srv.map(feats))
        from captionax.decode import beam_search

        for f, o in zip(feats, outs):
            ref = beam_search(params, f, k=3, max_steps=10)
            np.testing.assert_array_equal(o.tokens, np.asarray(ref.tokens))

    def test_empty_stream(self):
        srv = PipelinedDecoder(jax.jit(lambda x: x))
        assert list(srv.map([])) == []

    def test_packed_roundtrip(self):
        from captionax.decode.serving import unpack_beam_result

        params = dec.attention_gru_init(jax.random.PRNGKey(0), NF, F, E, H, V)
        params["fc"]["b"] = params["fc"]["b"].at[2].add(1.0)
        feats = jax.random.normal(jax.random.PRNGKey(1), (B, R, NF))
        direct = make_beam_server(params, max_steps=10, use_fused=False)
        packed = make_beam_server(params, max_steps=10, use_fused=False,
                                  packed=True)
        d = next(iter(direct.map([feats])))
        p = unpack_beam_result(next(iter(packed.map([feats]))))
        np.testing.assert_array_equal(p.tokens, d.tokens)
        np.testing.assert_array_equal(p.found, d.found)
        np.testing.assert_array_equal(p.lengths, d.lengths)
        np.testing.assert_allclose(p.scores, d.scores, atol=0)


def _theta_bank(key, n=3):
    """Stack n independently-initialized GRU thetas into a style bank."""
    import jax.tree_util as jtu

    thetas = [
        dec.attention_gru_init(k, NF, F, E, H, V)["gru"]
        for k in jax.random.split(key, n)
    ]
    return jtu.tree_map(lambda *xs: jnp.stack(xs), *thetas)


class TestMicroBatcher:
    """Request coalescing: concurrent submits -> fixed-shape dispatches,
    per-request results identical to a direct single decode."""

    def _params(self):
        params = dec.attention_gru_init(jax.random.PRNGKey(0), NF, F, E, H, V)
        params["fc"]["b"] = params["fc"]["b"].at[2].add(1.0)
        return params

    def test_concurrent_submits_match_direct(self):
        from concurrent.futures import ThreadPoolExecutor

        from captionax.decode.search import beam_search
        from captionax.decode.serving import MicroBatcher

        params = self._params()
        BS = 4
        fn = jax.jit(lambda f: beam_search(params, f, k=3, max_steps=10))
        reqs = [np.asarray(jax.random.normal(jax.random.PRNGKey(i), (R, NF)))
                for i in range(11)]  # not a multiple of BS -> padded tail
        with MicroBatcher(fn, BS, (R, NF)) as mb:
            with ThreadPoolExecutor(max_workers=8) as pool:
                futs = list(pool.map(mb.submit, reqs))
            outs = [f.result(timeout=60) for f in futs]
        ref = beam_search(params, np.stack(reqs), k=3, max_steps=10)
        for i, o in enumerate(outs):
            np.testing.assert_array_equal(o.tokens, np.asarray(ref.tokens)[i])
            assert bool(o.found) == bool(np.asarray(ref.found)[i])

    def test_styled_rows_route_correctly(self):
        from captionax.decode.search import greedy
        from captionax.decode.serving import MicroBatcher
        from captionax.models.hypernet import hypernet_init
        from captionax.train.steps import synthesize_theta_batched

        params = self._params()
        hn = hypernet_init(jax.random.PRNGKey(1), hyper_emb=E,
                           input_dim=E + F, hidden_dim=H)
        style_embeds = np.asarray(params["embed"])[np.arange(3)]
        bank = synthesize_theta_batched({"hn": hn}, style_embeds)
        fn = jax.jit(lambda f, rows: greedy(
            params, f, max_len=8,
            gru_params=jax.tree_util.tree_map(lambda t: t[rows], bank),
        ))
        reqs = [np.asarray(jax.random.normal(jax.random.PRNGKey(i), (R, NF)))
                for i in range(5)]
        rows = [i % 3 for i in range(5)]
        with MicroBatcher(fn, 4, (R, NF), styled=True) as mb:
            futs = [mb.submit(f, style_row=r) for f, r in zip(reqs, rows)]
            outs = [f.result(timeout=60) for f in futs]
        for f, r, o in zip(reqs, rows, outs):
            theta = jax.tree_util.tree_map(lambda t, r=r: t[r], bank)
            ref = greedy(params, f[None], max_len=8, gru_params=theta)
            np.testing.assert_array_equal(o, np.asarray(ref)[0])


class TestMixedStyleServing:
    """Theta-bank servers: the stream takes (features, style_rows) and
    must match per-image-theta decoding."""

    def test_beam_server_mixed(self):
        from captionax.decode import beam_search

        params = dec.attention_gru_init(jax.random.PRNGKey(0), NF, F, E, H, V)
        params["fc"]["b"] = params["fc"]["b"].at[2].add(1.0)
        bank = _theta_bank(jax.random.PRNGKey(1))
        batches = [
            (jax.random.normal(jax.random.PRNGKey(10 + i), (B, R, NF)),
             jnp.asarray([i % 3, (i + 1) % 3, 2, 0][:B], jnp.int32))
            for i in range(3)
        ]
        srv = make_beam_server(params, gru_params=bank, max_steps=10,
                               use_fused=False)
        for (f, rows), out in zip(batches, srv.map(batches)):
            theta = jax.tree_util.tree_map(lambda t: t[rows], bank)
            ref = beam_search(params, f, k=3, max_steps=10, gru_params=theta)
            np.testing.assert_array_equal(out.tokens, np.asarray(ref.tokens))

    def test_greedy_server_mixed(self):
        from captionax.decode.search import greedy
        from captionax.decode.serving import make_greedy_server

        params = dec.attention_gru_init(jax.random.PRNGKey(2), NF, F, E, H, V)
        bank = _theta_bank(jax.random.PRNGKey(3))
        f = jax.random.normal(jax.random.PRNGKey(4), (B, R, NF))
        rows = jnp.asarray([0, 2, 1, 2][:B], jnp.int32)
        srv = make_greedy_server(params, gru_params=bank, max_len=10,
                                 use_fused=False)
        out = next(iter(srv.map([(f, rows)])))
        theta = jax.tree_util.tree_map(lambda t: t[rows], bank)
        ref = greedy(params, f, max_len=10, gru_params=theta)
        np.testing.assert_array_equal(out, np.asarray(ref))

    def test_sharded_mixed_matches_single_device(self):
        assert len(jax.devices()) == 8
        from captionax.decode.serving import (
            make_sharded_beam_decode,
            unpack_beam_result,
        )
        from captionax.ops.decode_kernel import fused_beam_search
        from captionax.parallel.mesh import make_mesh

        params = dec.attention_gru_init(jax.random.PRNGKey(5), NF, F, E, H, V)
        params["fc"]["b"] = params["fc"]["b"].at[2].add(0.4)
        bank = _theta_bank(jax.random.PRNGKey(6))
        feats = jax.random.normal(jax.random.PRNGKey(7), (16, R, NF))
        rows = jnp.asarray(np.arange(16) % 3, jnp.int32)
        ref = fused_beam_search(
            params, feats, gru_params=bank, max_steps=8, block_images=2,
            interpret=True, f32=True, style_rows=rows,
        )
        mesh = make_mesh()
        decode = make_sharded_beam_decode(
            mesh, params, gru_params=bank, max_steps=8, block_images=2,
            interpret=True, f32=True,
        )
        got = decode(feats, rows)
        np.testing.assert_array_equal(
            np.asarray(got.tokens), np.asarray(ref.tokens)
        )
        np.testing.assert_array_equal(
            np.asarray(got.found), np.asarray(ref.found)
        )
        packed = PipelinedDecoder(make_sharded_beam_decode(
            mesh, params, gru_params=bank, max_steps=8, block_images=2,
            interpret=True, f32=True, packed=True,
        ))
        up = unpack_beam_result(next(iter(packed.map([(feats, rows)]))))
        np.testing.assert_array_equal(up.tokens, np.asarray(ref.tokens))


class TestProfilerTrace:
    def test_trace_writes_files(self, tmp_path):
        from captionax.core.runtime import trace

        with trace(str(tmp_path)):
            x = jnp.ones((64, 64))
            (x @ x).block_until_ready()
        files = glob.glob(os.path.join(str(tmp_path), "**", "*"),
                          recursive=True)
        assert any(os.path.isfile(f) for f in files)


class TestGreedyServer:
    def test_matches_direct(self):
        from captionax.decode.search import greedy
        from captionax.decode.serving import make_greedy_server

        params = dec.attention_gru_init(jax.random.PRNGKey(2), NF, F, E, H, V)
        feats = [jax.random.normal(jax.random.PRNGKey(i), (B, R, NF))
                 for i in range(3)]
        srv = make_greedy_server(params, max_len=10, use_fused=False)
        for f, out in zip(feats, srv.map(feats)):
            np.testing.assert_array_equal(
                out, np.asarray(greedy(params, f, max_len=10))
            )


class TestShardedDecode:
    """Multi-chip serving: the scan beam under a batch-sharded 8-device
    mesh must match the single-device result exactly."""

    def test_beam_data_parallel(self):
        assert len(jax.devices()) == 8
        from jax.sharding import NamedSharding, PartitionSpec as P

        from captionax.decode import beam_search
        from captionax.parallel.mesh import make_mesh

        params = dec.attention_gru_init(jax.random.PRNGKey(3), NF, F, E, H, V)
        params["fc"]["b"] = params["fc"]["b"].at[2].add(0.4)
        feats = jax.random.normal(jax.random.PRNGKey(4), (16, R, NF))
        ref = beam_search(params, feats, k=3, max_steps=8)

        mesh = make_mesh()  # 8-way data axis
        shard = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        params8 = jax.device_put(params, rep)
        feats8 = jax.device_put(feats, shard)
        fn = jax.jit(
            lambda p, f: beam_search(p, f, k=3, max_steps=8),
            in_shardings=(rep, shard),
        )
        got = fn(params8, feats8)
        np.testing.assert_array_equal(
            np.asarray(got.tokens), np.asarray(ref.tokens)
        )
        np.testing.assert_array_equal(
            np.asarray(got.found), np.asarray(ref.found)
        )

    def test_fused_beam_shard_map(self):
        """shard_map over the fused Pallas kernel (interpret mode on the
        CPU mesh): per-device kernel launches over the data axis must
        reproduce the single-device kernel bit-exactly."""
        assert len(jax.devices()) == 8
        from captionax.decode.serving import make_sharded_beam_decode
        from captionax.ops.decode_kernel import fused_beam_search
        from captionax.parallel.mesh import make_mesh

        params = dec.attention_gru_init(jax.random.PRNGKey(5), NF, F, E, H, V)
        params["fc"]["b"] = params["fc"]["b"].at[2].add(0.4)
        feats = jax.random.normal(jax.random.PRNGKey(6), (16, R, NF))
        ref = fused_beam_search(
            params, feats, max_steps=8, block_images=2, interpret=True,
            f32=True,
        )
        mesh = make_mesh()  # 8-way data axis; 2 images per device
        decode = make_sharded_beam_decode(
            mesh, params, max_steps=8, block_images=2, interpret=True,
            f32=True,
        )
        got = decode(feats)
        np.testing.assert_array_equal(
            np.asarray(got.tokens), np.asarray(ref.tokens)
        )
        np.testing.assert_array_equal(
            np.asarray(got.found), np.asarray(ref.found)
        )
        np.testing.assert_array_equal(
            np.asarray(got.lengths), np.asarray(ref.lengths)
        )
        np.testing.assert_allclose(
            np.asarray(got.scores), np.asarray(ref.scores), rtol=1e-6
        )

    def test_fused_beam_shard_map_packed(self):
        """packed=True multi-chip stream: one int32 buffer, roundtrips."""
        assert len(jax.devices()) == 8
        from captionax.decode.serving import (
            make_sharded_beam_decode,
            unpack_beam_result,
        )
        from captionax.parallel.mesh import make_mesh

        params = dec.attention_gru_init(jax.random.PRNGKey(7), NF, F, E, H, V)
        params["fc"]["b"] = params["fc"]["b"].at[2].add(0.4)
        feats = jax.random.normal(jax.random.PRNGKey(8), (16, R, NF))
        mesh = make_mesh()
        plain = make_sharded_beam_decode(
            mesh, params, max_steps=8, block_images=2, interpret=True,
            f32=True,
        )(feats)
        srv = PipelinedDecoder(make_sharded_beam_decode(
            mesh, params, max_steps=8, block_images=2, interpret=True,
            f32=True, packed=True,
        ))
        got = unpack_beam_result(next(iter(srv.map([feats]))))
        np.testing.assert_array_equal(got.tokens, np.asarray(plain.tokens))
        np.testing.assert_array_equal(got.lengths, np.asarray(plain.lengths))
        np.testing.assert_array_equal(got.found, np.asarray(plain.found))
