"""Reference Lightning checkpoint -> captionax params (models/convert.py).

Builds torch modules with the exact reference attribute layouts
(CaptionAttentionGru train_attention_gru.py:32-52, HyperNet
hypernet_attention.py:32-101, HyperNetCC cc_train_hypernet.py:42-108),
saves Lightning-style .ckpt blobs, imports them, and requires the
converted pytrees to reproduce the torch modules' outputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from captionax.models import convert, decoder as dec  # noqa: E402
from captionax.models.hypernet import (  # noqa: E402
    hypernet_apply_flat,
)

torch.manual_seed(7)

B, R, NF, F, E, H, V, T = 2, 9, 32, 12, 12, 12, 41, 5


class RefBahdanau(nn.Module):
    """/root/reference/models/attention.py:5-20 attribute names."""

    def __init__(self):
        super().__init__()
        self.W_a = nn.Linear(F, H)
        self.U_a = nn.Linear(H, H)
        self.v_a = nn.Linear(H, 1)

    def forward(self, features, hidden):
        a = torch.tanh(self.W_a(features) + self.U_a(hidden).unsqueeze(1))
        w = torch.softmax(self.v_a(a), dim=1)
        return (w * features).sum(dim=1), w.squeeze(2)


class RefAttentionGru(nn.Module):
    """/root/reference/models/decoderlstm.py:11-47 attribute names."""

    def __init__(self, num_layers=1):
        super().__init__()
        self.feature_fc = nn.Sequential(
            nn.Linear(NF, F), nn.ReLU(), nn.Linear(F, F)
        )
        self.embed = nn.Embedding(V, E)
        self.gru = nn.GRUCell(E + F, H)
        if num_layers > 1:
            self.layers = nn.ModuleList(
                [nn.GRUCell(H, H) for _ in range(num_layers - 1)]
            )
        self.fc = nn.Linear(H, V)
        self.attention = RefBahdanau()
        self.init_h = nn.Linear(F, H)

    def forward(self, raw_feats, captions):
        """Teacher-forced reference semantics (decoderlstm.py:49-120):
        zeroed embedding at t=0, embed[t-1] after."""
        feats = self.feature_fc(raw_feats)
        embeds = self.embed(captions)
        h = self.init_h(feats.mean(dim=1))
        for cell in getattr(self, "layers", []):  # decoderlstm.py:63-66
            h = cell(h, h)
        outs = []
        for t in range(captions.shape[1]):
            we = (torch.zeros_like(embeds[:, 0]) if t == 0
                  else embeds[:, t - 1])
            ctx, _ = self.attention(feats, h)
            h = self.gru(torch.cat([we, ctx], dim=1), h)
            for cell in getattr(self, "layers", []):
                h = cell(h, h)
            outs.append(self.fc(h))
        return torch.stack(outs, 1)


def _head(w_size, he, N=1, M=500):
    """hn_heads bucketing (hypernet_attention.py:75-99) for the sizes
    exercised here (every tensor takes the middle branch at these dims)."""
    assert w_size >= N * he and w_size // M < N * he
    return nn.Sequential(
        nn.Linear(N * he, N * he), nn.LeakyReLU(), nn.Linear(N * he, w_size)
    )


class RefHyperNet(nn.Module):
    """hypernet_attention.py:32-101 attribute names (hn over captioner.gru)."""

    def __init__(self, hyper_emb=E):
        super().__init__()
        self.captioner = RefAttentionGru()
        self.hn_base = nn.Sequential(
            nn.Linear(hyper_emb, hyper_emb), nn.LeakyReLU(),
            nn.Linear(hyper_emb, hyper_emb), nn.LeakyReLU(),
        )
        sizes = [w.numel() for _, w in self.captioner.gru.named_parameters()]
        self.hn_heads = nn.ModuleList([_head(s, hyper_emb) for s in sizes])

    def theta_flat(self, style_embed):
        base = self.hn_base(style_embed)
        return torch.cat([h(base).flatten() for h in self.hn_heads])


def _batch():
    g = torch.Generator().manual_seed(3)
    feats = torch.randn(B, R, NF, generator=g)
    caps = torch.randint(1, V, (B, T), generator=g)
    return feats, caps


class TestAttentionGruImport:
    def test_teacher_forced_logits_match(self):
        m = RefAttentionGru()
        sd = {f"captioner.{k}": v for k, v in m.state_dict().items()}
        params = convert.attention_gru_from_state_dict(sd)
        feats, caps = _batch()
        with torch.no_grad():
            ref = m(feats, caps).numpy()
        got, _ = dec.teacher_forced(
            params, jnp.asarray(feats.numpy()), jnp.asarray(caps.numpy())
        )
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)

    def test_extra_gru_layers_roundtrip(self):
        m = RefAttentionGru(num_layers=3)
        sd = {f"captioner.{k}": v for k, v in m.state_dict().items()}
        params = convert.attention_gru_from_state_dict(sd)
        assert len(params["layers"]) == 2
        feats, caps = _batch()
        with torch.no_grad():
            ref = m(feats, caps).numpy()
        got, _ = dec.teacher_forced(
            params, jnp.asarray(feats.numpy()), jnp.asarray(caps.numpy())
        )
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


class TestHyperNetImport:
    def test_theta_matches_reference_heads(self):
        m = RefHyperNet()
        hn = convert.hypernet_from_state_dict(m.state_dict())
        g = torch.Generator().manual_seed(5)
        style = torch.randn(E, generator=g)
        with torch.no_grad():
            ref = m.theta_flat(style).numpy()
        got = hypernet_apply_flat(hn, jnp.asarray(style.numpy()))
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)

    def test_lightning_ckpt_roundtrip(self, tmp_path):
        m = RefHyperNet()
        path = tmp_path / "epoch=19.ckpt"
        torch.save(
            {"state_dict": m.state_dict(),
             "hyper_parameters": {"feature_size": F, "embed_size": E,
                                  "hidden_size": H, "lr": 2e-3}},
            path,
        )
        out = convert.load_lightning_checkpoint(str(path))
        assert out["kind"] == "hypernet"
        assert out["hparams"]["hidden_size"] == H
        assert out["encoder_state_dict"] is None
        g = torch.Generator().manual_seed(5)
        style = torch.randn(E, generator=g)
        with torch.no_grad():
            ref = m.theta_flat(style).numpy()
        got = hypernet_apply_flat(
            out["params"]["hn"], jnp.asarray(style.numpy())
        )
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)

    def test_cc_nesting_and_domain_table(self):
        hn = RefHyperNet()
        outer = nn.Module()
        outer.hypernet = hn
        outer.embed = nn.Embedding(7, E)
        sd = outer.state_dict()
        kind, params, enc = convert.import_lightning_state_dict(sd)
        assert kind == "hypernet_cc"
        assert enc is None
        np.testing.assert_allclose(
            np.asarray(params["domain_emb"]["table"]),
            outer.embed.weight.detach().numpy(),
        )
        feats, caps = _batch()
        with torch.no_grad():
            ref = hn.captioner(feats, caps).numpy()
        got, _ = dec.teacher_forced(
            params["decoder"], jnp.asarray(feats.numpy()),
            jnp.asarray(caps.numpy()),
        )
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)

    def test_cc_histogram_embed_scheme(self):
        sd = {}
        emb = nn.Sequential(nn.Linear(V + 1, 4 * E), nn.LeakyReLU(),
                            nn.Linear(4 * E, E), nn.LeakyReLU())
        for k, v in emb.state_dict().items():
            sd[f"embed.{k}"] = v
        p = convert.domain_embedder_from_state_dict(sd)
        assert p["l0"]["w"].shape == (V + 1, 4 * E)
        assert p["l1"]["w"].shape == (4 * E, E)


class TestEncoderRemap:
    def test_sequential_indices_to_torchvision_names(self):
        from tests.fixtures.converter_fixture import (
            fabricate_resnet_state_dict,
        )

        tv = fabricate_resnet_state_dict()
        inverse = {v: k for k, v in convert._RESNET_SEQ_NAMES.items()}
        lightning = {}
        for key, val in tv.items():
            head, _, tail = key.partition(".")
            lightning[f"image_encoder.resnet.{inverse[head]}.{tail}"] = val
        remapped = convert.encoder_state_dict_from_lightning(lightning)
        assert set(remapped) == set(tv)
        for key in tv:
            np.testing.assert_array_equal(remapped[key], np.asarray(tv[key]))


class TestImportCLI:
    def test_cli_writes_evaluate_compatible_checkpoint(self, tmp_path):
        from captionax.cli.import_checkpoint import main
        from captionax.train.checkpoint import restore_checkpoint

        outer = nn.Module()  # CaptionAttentionGru nests under `captioner.`
        outer.captioner = RefAttentionGru()
        m = outer.captioner
        ckpt = tmp_path / "gru.ckpt"
        torch.save({"state_dict": outer.state_dict()}, ckpt)
        out_dir = tmp_path / "imported"
        imported = main(["--ckpt", str(ckpt), "--out", str(out_dir)])
        assert imported["kind"] == "gru"
        restored = restore_checkpoint(str(out_dir))
        feats, caps = _batch()
        with torch.no_grad():
            ref = m(feats, caps).numpy()
        got, _ = dec.teacher_forced(
            restored, jnp.asarray(feats.numpy()), jnp.asarray(caps.numpy())
        )
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


def _trees_equal(a, b, path=""):
    import jax

    la = jax.tree_util.tree_leaves_with_path(a)
    lb = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_leaves_with_path(b)}
    assert len(la) == len(lb)
    for k, v in la:
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(lb[jax.tree_util.keystr(k)]))


class TestExport:
    """export_lightning_state_dict is the exact inverse of import: the
    reference modules strict-load the output and reimport is bit-exact."""

    def test_gru_strict_load_and_bitexact_roundtrip(self):
        m = RefAttentionGru(num_layers=2)
        sd0 = {f"captioner.{k}": v for k, v in m.state_dict().items()}
        params = convert.attention_gru_from_state_dict(sd0)
        sd = convert.export_lightning_state_dict("gru", params)
        m2 = RefAttentionGru(num_layers=2)
        m2.load_state_dict(
            {k[len("captioner."):]: torch.from_numpy(v)
             for k, v in sd.items()}, strict=True)
        kind, params2, enc = convert.import_lightning_state_dict(sd)
        assert kind == "gru" and enc is None
        _trees_equal(params, params2)
        feats, caps = _batch()
        with torch.no_grad():
            ref = m(feats, caps).numpy()
        with torch.no_grad():
            re_exported = m2(feats, caps).numpy()
        np.testing.assert_array_equal(ref, re_exported)

    def test_hypernet_strict_load_and_roundtrip(self):
        m = RefHyperNet()
        kind0, params, _ = convert.import_lightning_state_dict(
            m.state_dict())
        assert kind0 == "hypernet"
        sd = convert.export_lightning_state_dict("hypernet", params)
        m2 = RefHyperNet()
        m2.load_state_dict(
            {k: torch.from_numpy(v) for k, v in sd.items()}, strict=True)
        kind, params2, _ = convert.import_lightning_state_dict(sd)
        assert kind == "hypernet"
        _trees_equal(params, params2)
        g = torch.Generator().manual_seed(5)
        style = torch.randn(E, generator=g)
        with torch.no_grad():
            np.testing.assert_array_equal(m.theta_flat(style).numpy(),
                                          m2.theta_flat(style).numpy())

    def test_hypernet_cc_roundtrip_with_domain_table(self):
        hn = RefHyperNet()
        outer = nn.Module()
        outer.hypernet = hn
        outer.embed = nn.Embedding(7, E)
        kind0, params, _ = convert.import_lightning_state_dict(
            outer.state_dict())
        assert kind0 == "hypernet_cc"
        sd = convert.export_lightning_state_dict("hypernet_cc", params)
        kind, params2, _ = convert.import_lightning_state_dict(sd)
        assert kind == "hypernet_cc"
        _trees_equal(params, params2)

    def test_encoder_identity_bn_export_is_exact(self):
        import jax

        from captionax.models import encoder as enc_mod

        enc_p = enc_mod.resnet_init(jax.random.PRNGKey(0), 50)
        sd = convert.encoder_state_dict_from_params(enc_p)
        # torchvision-layout keys with identity BN stats
        assert sd["bn1.running_mean"].sum() == 0.0
        back = enc_mod.from_torch_state_dict(sd, depth=50)
        _trees_equal(enc_p, back)

    def test_export_cli_reimport_roundtrip(self, tmp_path):
        import jax

        from captionax.cli.export_checkpoint import main as export_main
        from captionax.cli.import_checkpoint import main as import_main
        from captionax.train.checkpoint import (restore_checkpoint,
                                                save_checkpoint)

        m = RefHyperNet()
        _, params, _ = convert.import_lightning_state_dict(m.state_dict())
        ckpt_dir = tmp_path / "trained"
        save_checkpoint(str(ckpt_dir), 0, params)
        out_ckpt = tmp_path / "exported.ckpt"
        export_main(["--checkpoint-dir", str(ckpt_dir), "--kind",
                     "hypernet", "--out", str(out_ckpt),
                     "--hparams", '{"lr": 0.002}'])
        blob = torch.load(out_ckpt, map_location="cpu", weights_only=False)
        assert blob["hyper_parameters"]["lr"] == 0.002
        back_dir = tmp_path / "reimported"
        import_main(["--ckpt", str(out_ckpt), "--out", str(back_dir)])
        _trees_equal(params, restore_checkpoint(str(back_dir)))
