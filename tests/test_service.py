"""HTTP caption service (captionax/decode/service.py): request->caption
round-trips, style routing, error paths, and request coalescing (CPU,
scan decoders; the fused path is the same graph the smokes/TPU runs
cover)."""

import base64
import json
import os
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

IMG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "images")

ARGS = [
    "--synthetic", "--batch-size", "4", "--encoder-depth", "50",
    "--embed-size", "16", "--hidden-size", "16", "--feature-size", "16",
    "--hyper-emb", "8", "--hn-m", "64", "--beam-max-steps", "6",
    "--kind", "hypernet", "--styles", "factual,humour",
    "--no-fused", "--window", "4",
]


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    from captionax.cli.serve import build_service, main  # noqa: F401
    from captionax.decode.service import serve_background

    ckpt = tmp_path_factory.mktemp("serve_ckpt")
    from captionax.cli.serve import make_serve_parser

    # the real flag surface (new serve flags can't drift out of sync)
    parser = make_serve_parser("test")
    args = parser.parse_args(
        ARGS + ["--checkpoint-dir", str(ckpt), "--window", "4"]
    )
    service = build_service(args)
    srv, port = serve_background(service)
    yield service, port
    srv.shutdown()
    service.close()


def _post(port, path, data, ctype):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=data,
        headers={"Content-Type": ctype}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def _jpeg_bytes():
    with open(os.path.join(IMG_DIR, "photo_gradient.jpg"), "rb") as f:
        return f.read()


class TestHttpSurface:
    def test_healthz(self, served):
        _service, port = served
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            body = json.loads(r.read())
        assert body["status"] == "ok"
        assert body["styles"] == ["factual", "humour"]

    def test_caption_raw_image_body(self, served):
        _service, port = served
        status, body = _post(port, "/caption?style=humour",
                             _jpeg_bytes(), "image/jpeg")
        assert status == 200
        assert body["style"] == "humour"
        assert isinstance(body["caption"], str)
        assert isinstance(body["score"], float)
        assert isinstance(body["completed"], bool)

    def test_caption_json_base64(self, served):
        _service, port = served
        payload = json.dumps({
            "image_b64": base64.b64encode(_jpeg_bytes()).decode(),
            "style": "factual",
        }).encode()
        status, body = _post(port, "/caption", payload, "application/json")
        assert status == 200 and body["style"] == "factual"

    def test_unknown_style_is_400(self, served):
        _service, port = served
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(port, "/caption?style=noir", _jpeg_bytes(), "image/jpeg")
        assert ei.value.code == 400
        assert "noir" in json.loads(ei.value.read())["error"]

    def test_undecodable_image_is_400(self, served):
        _service, port = served
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(port, "/caption", b"not an image", "image/jpeg")
        assert ei.value.code == 400

    def test_stats_endpoint(self, served):
        _service, port = served
        _post(port, "/caption?style=factual", _jpeg_bytes(), "image/jpeg")
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=30) as r:
            body = json.loads(r.read())
        assert body["served"] >= 1
        assert body["p50_ms"] > 0

    def test_unknown_path_is_404(self, served):
        _service, port = served
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(port, "/elsewhere", b"{}", "application/json")
        assert ei.value.code == 404


class TestCoalescingAndDeterminism:
    def test_concurrent_requests_coalesce_and_agree(self, served):
        """N concurrent posts of the same image+style must (a) all
        succeed with the SAME caption (batch position must not change
        the output) and (b) ride fewer dispatches than requests."""
        service, port = served
        batcher = service._batcher
        calls = []
        inner = batcher.decode_fn
        batcher.decode_fn = lambda f, r: (calls.append(1) or inner(f, r))
        try:
            data = _jpeg_bytes()
            results, errs = [], []

            def post():
                try:
                    results.append(_post(port, "/caption?style=factual",
                                         data, "image/jpeg"))
                except Exception as e:  # pragma: no cover
                    errs.append(e)

            threads = [threading.Thread(target=post) for _ in range(8)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=300)
        finally:
            batcher.decode_fn = inner
        assert not errs
        assert len(results) == 8
        caps = {body["caption"] for _, body in results}
        assert len(caps) == 1, f"batch position changed the caption: {caps}"
        # window=4: 8 requests need >=2 dispatches, but coalescing should
        # need strictly fewer than one dispatch per request
        assert 2 <= len(calls) < 8


class TestServiceLibrary:
    def test_caption_array_direct(self, served):
        service, _port = served
        img = np.zeros((224, 224, 3), np.uint8)
        out = service.caption_array(img, "factual")
        assert set(out) >= {"caption", "score", "completed", "style"}

    def test_greedy_service_mode(self):
        """decode='greedy' serves token-argmax captions through the
        same coalescing path (no score/completed fields)."""
        import jax

        from captionax.core.vocab import build_vocab
        from captionax.decode.service import CaptionService
        from captionax.models import decoder as dec
        from captionax.models.encoder import resnet_init
        from captionax.models.hypernet import hypernet_init

        vocab = build_vocab(["a dog runs fast", "a cat sits still"], [])
        k = jax.random.split(jax.random.PRNGKey(0), 3)
        E = H = F = 16
        params = {
            "decoder": dec.attention_gru_init(k[0], 2048, F, E, H,
                                              len(vocab)),
            "hn": hypernet_init(k[1], hyper_emb=E, input_dim=E + F,
                                hidden_dim=H),
        }
        enc = resnet_init(k[2], depth=50)
        with CaptionService(params, enc, vocab, styles=["factual"],
                            batch_size=2, max_steps=5, use_fused=False,
                            decode="greedy") as svc:
            out = svc.caption_array(np.zeros((224, 224, 3), np.uint8),
                                    "factual")
        assert set(out) == {"caption", "style"}
        assert isinstance(out["caption"], str)

    @pytest.mark.skipif(
        os.environ.get("CAPTIONAX_SLOW_TESTS", "") != "1",
        reason="int8 conv compiles slowly on CPU; set CAPTIONAX_SLOW_TESTS=1",
    )
    def test_int8_encoder_service_round_trip(self):
        """int8_encoder=True quantizes the frozen encoder at build; the
        request->caption round trip must still work and the caption stays
        a valid decode (token agreement with bf16 is measured on-chip by
        benchmarks/bulk_caption.py --int8)."""
        import jax

        from captionax.core.vocab import build_vocab
        from captionax.decode.service import CaptionService
        from captionax.models import decoder as dec
        from captionax.models.encoder import resnet_init
        from captionax.models.hypernet import hypernet_init

        vocab = build_vocab(["a dog runs fast", "a cat sits still"], [])
        k = jax.random.split(jax.random.PRNGKey(0), 3)
        E = H = F = 16
        params = {
            "decoder": dec.attention_gru_init(k[0], 2048, F, E, H,
                                              len(vocab)),
            "hn": hypernet_init(k[1], hyper_emb=E, input_dim=E + F,
                                hidden_dim=H),
        }
        enc = resnet_init(k[2], depth=50)
        with CaptionService(params, enc, vocab, styles=["factual"],
                            batch_size=2, max_steps=5, use_fused=False,
                            decode="greedy", int8_encoder=True) as svc:
            out = svc.caption_array(np.zeros((224, 224, 3), np.uint8),
                                    "factual")
        assert set(out) == {"caption", "style"}
        assert isinstance(out["caption"], str)

    def test_mesh_sharded_service_matches_single_device(self):
        """mesh= shards each dispatch over the data axis (8 virtual CPU
        devices here); captions must match the unsharded service."""
        import jax

        from captionax.core.vocab import build_vocab
        from captionax.decode.service import CaptionService
        from captionax.models import decoder as dec
        from captionax.models.encoder import resnet_init
        from captionax.models.hypernet import hypernet_init
        from captionax.parallel.mesh import make_mesh

        vocab = build_vocab(["a dog runs fast", "a cat sits still"], [])
        k = jax.random.split(jax.random.PRNGKey(0), 3)
        E = H = F = 16
        params = {
            "decoder": dec.attention_gru_init(k[0], 2048, F, E, H,
                                              len(vocab)),
            "hn": hypernet_init(k[1], hyper_emb=E, input_dim=E + F,
                                hidden_dim=H),
        }
        enc = resnet_init(k[2], depth=50)
        img = (np.arange(224 * 224 * 3) % 251).reshape(
            224, 224, 3).astype(np.uint8)
        kw = dict(styles=["factual", "humour"], batch_size=8, max_steps=5,
                  use_fused=False)
        with CaptionService(params, enc, vocab, **kw) as single:
            want = single.caption_array(img, "humour")
        mesh = make_mesh(n_data=8)
        with CaptionService(params, enc, vocab, mesh=mesh, **kw) as shard:
            got = shard.caption_array(img, "humour")
        assert got["caption"] == want["caption"]
        np.testing.assert_allclose(got["score"], want["score"], rtol=1e-5)

    def test_mesh_batch_size_must_divide(self):
        import jax

        from captionax.core.vocab import build_vocab
        from captionax.decode.service import CaptionService
        from captionax.models import decoder as dec
        from captionax.models.encoder import resnet_init
        from captionax.parallel.mesh import make_mesh

        vocab = build_vocab(["a dog runs fast"], [])
        k = jax.random.split(jax.random.PRNGKey(0), 2)
        params = dec.attention_gru_init(k[0], 2048, 8, 8, 8, len(vocab))
        with pytest.raises(ValueError, match="divide"):
            CaptionService(params, resnet_init(k[1], depth=50), vocab,
                           batch_size=3, max_steps=4, use_fused=False,
                           mesh=make_mesh(n_data=8))

    def test_submit_unknown_style_raises(self, served):
        service, _port = served
        with pytest.raises(KeyError):
            service.submit_array(np.zeros((224, 224, 3), np.uint8), "noir")

    def test_submit_wrong_shape_raises(self, served):
        service, _port = served
        with pytest.raises(ValueError):
            service.submit_array(np.zeros((64, 64, 3), np.uint8), "factual")

    def test_worker_survives_decode_failure(self, served):
        """A dispatch that raises must fail its OWN futures and leave the
        worker alive for the next request (a dead worker hangs every
        later submit forever)."""
        service, _port = served
        batcher = service._batcher
        inner = batcher.decode_fn

        def boom(*a):
            raise RuntimeError("injected device failure")

        batcher.decode_fn = boom
        try:
            fut = batcher.submit(np.zeros((224, 224, 3), np.uint8), 0)
            with pytest.raises(RuntimeError, match="injected"):
                fut.result(timeout=60)
        finally:
            batcher.decode_fn = inner
        # worker must still serve
        out = service.caption_array(np.zeros((224, 224, 3), np.uint8),
                                    "factual")
        assert "caption" in out
