"""CLI entry-point smokes: run each main() end-to-end at tiny dims on
synthetic data (CPU).  These drive the same argparse surface a user
gets, per reference script (SURVEY.md L5 layer).

All smokes share the same encoder/model dims so the ResNet and
train-step compiles are reused across tests within the process.  The
heavier long-tail CLIs run only with CAPTIONAX_SLOW_TESTS=1.
"""

import os

import pytest

SLOW = os.environ.get("CAPTIONAX_SLOW_TESTS", "") == "1"

TINY = [
    "--synthetic", "--synthetic-images", "8", "--batch-size", "4",
    "--max-epochs", "1", "--encoder-depth", "50",
    "--embed-size", "16", "--hidden-size", "16", "--feature-size", "16",
    "--hyper-emb", "8", "--hn-m", "64",
    "--max-len", "8", "--beam-max-steps", "6",
]


def args(tmp_path, *extra):
    return TINY + ["--checkpoint-dir", str(tmp_path / "ckpt"), *extra]


def _cc_file(tmp_path, n_domains=2, per_domain=8):
    """Tiny CC caption file in the 5-space reference format."""
    sep = " " * 5
    lines = []
    for d in range(n_domains):
        dom = ["alamy", "dailymail", "wordpress"][d % 3]
        for i in range(per_domain):
            lines.append(f"{d}_{i}.jpg{sep}a small {dom} test caption "
                         f"number {i}{sep}{dom}")
    p = tmp_path / "cc_train.txt"
    p.write_text("\n".join(lines) + "\n")
    return p


def _gcc_tsv(tmp_path, n=12):
    """Tiny GCC tsv (caption<TAB>url) over the reference's 9 sites."""
    rows = [
        f"a stock photo number {i}\thttp://www.alamy.com/img{i}.jpg"
        if i % 2 == 0 else
        f"a daily picture number {i}\thttp://i.dailymail.co.uk/img{i}.jpg"
        for i in range(n)
    ]
    p = tmp_path / "gcc.tsv"
    p.write_text("\n".join(rows) + "\n")
    return p


class TestCoreClis:
    def test_train_gru_then_evaluate(self, tmp_path):
        from captionax.cli.train_gru import main

        hist = main(args(tmp_path))
        assert hist is not None
        ckpts = list((tmp_path / "ckpt").rglob("*"))
        assert ckpts, "checkpoint must be written"

        from captionax.cli.evaluate import main as eval_main

        results = eval_main(args(tmp_path, "--kind", "gru",
                                 "--styles", "factual"))
        assert "factual" in results

    def test_train_gru_mesh_data(self, tmp_path):
        """--mesh-data N trains data-parallel over the virtual 8-device
        mesh through the same CLI surface (harness shards batches over
        the ``data`` axis; grads all-reduce via GSPMD)."""
        from captionax.cli.train_gru import main

        hist = main(args(tmp_path, "--mesh-data", "8",
                         "--batch-size", "8", "--synthetic-images", "16"))
        assert hist is not None
        import numpy as np

        assert np.isfinite(hist[0]["train_loss_epoch"])

    def test_visualize_random_init(self, tmp_path):
        from captionax.cli.visualize import main as viz_main

        out = tmp_path / "viz.html"
        viz_main(args(tmp_path, "--out", str(out), "--num-images", "2"))
        html = out.read_text()
        assert "<html" in html.lower() and "img" in html.lower()

    def test_visualize_gru_checkpoint(self, tmp_path):
        """--kind gru restores a plain train_gru checkpoint (the reference
        visualize_gru path) — regressed once: the CLI only built the
        hypernet tree and orbax refused the restore."""
        from captionax.cli.train_gru import main as train_main
        from captionax.cli.visualize import main as viz_main

        train_main(args(tmp_path))
        out = tmp_path / "viz_gru.html"
        viz_main(args(tmp_path, "--out", str(out), "--num-images", "2",
                      "--kind", "gru"))
        html = out.read_text()
        assert "<html" in html.lower() and "factual" in html
        assert "humour" not in html  # plain captioner has no style columns

    def test_train_hypernet(self, tmp_path):
        from captionax.cli.train_hypernet import main

        assert main(args(tmp_path))

    def test_train_hypernet_mixup(self, tmp_path):
        """classifier --save -> train_hypernet --mixup consumes it
        (hypernet_attention.py:147-191 with the frozen style scorer)."""
        from captionax.cli.train_classifier import main as clf_main
        from captionax.cli.train_hypernet import main as hn_main

        clf = tmp_path / "clf.pkl"
        clf_main(args(tmp_path, "--kind", "small", "--save", str(clf)))
        assert clf.exists()
        hist = hn_main(args(tmp_path, "--mixup", "--styled-fixture",
                            "--style-classifier", str(clf)))
        assert all("train_loss_epoch" in h for h in hist.values())

    def test_train_hypernet_mixup_split(self, tmp_path):
        """--mixup-split trains via the split-dispatch gradient (the
        relay-safe path; gradient equality vs the fused graph is
        enforced in test_hypernet_train.py)."""
        from captionax.cli.train_classifier import main as clf_main
        from captionax.cli.train_hypernet import main as hn_main

        clf = tmp_path / "clf.pkl"
        clf_main(args(tmp_path, "--kind", "small", "--save", str(clf)))
        hist = hn_main(args(tmp_path, "--mixup", "--mixup-split",
                            "--styled-fixture",
                            "--style-classifier", str(clf)))
        assert all("train_loss_epoch" in h for h in hist.values())

    def test_train_hypernet_style_aux(self, tmp_path):
        """--style-aux (captionax extension): the frozen style probe
        scores the free-run caption under the batch's own theta; split
        variant covered by gradient-equality in test_hypernet_train.py."""
        from captionax.cli.train_classifier import main as clf_main
        from captionax.cli.train_hypernet import main as hn_main

        clf = tmp_path / "clf.pkl"
        clf_main(args(tmp_path, "--kind", "small", "--save", str(clf)))
        hist = hn_main(args(tmp_path, "--style-aux", "--styled-fixture",
                            "--style-classifier", str(clf)))
        assert all("train_loss_epoch" in h for h in hist.values())

    def test_train_hypernet_dedicated_style_tokens(self, tmp_path):
        """--dedicated-style-tokens round-trip: train builds the 3-row
        style table, evaluate restores + beams with it."""
        from captionax.cli.evaluate import main as eval_main
        from captionax.cli.train_hypernet import main as hn_main

        hist = hn_main(args(tmp_path, "--dedicated-style-tokens",
                            "--styled-fixture"))
        assert all("train_loss_epoch" in h for h in hist.values())
        res = eval_main(args(tmp_path, "--dedicated-style-tokens",
                             "--kind", "hypernet"))
        assert set(res) == {"factual", "humour", "romantic"}

    def test_cc_train_hypernet(self, tmp_path):
        from captionax.cli.cc_train_hypernet import main

        cc = _cc_file(tmp_path)
        assert main(args(tmp_path, "--domain-scheme", "one hot",
                         "--cc-captions", str(cc))) is not None

    def test_train_lstm_attention(self, tmp_path):
        from captionax.cli.train_lstm import main
        from captionax.train.checkpoint import latest_step, restore_checkpoint

        state, results = main(args(tmp_path, "--variant", "attention"))
        assert state is not None
        # final checkpoint saved + restorable (reference ModelCheckpoint)
        ckpt_dir = str(tmp_path / "ckpt")
        assert latest_step(ckpt_dir) is not None
        restored = restore_checkpoint(ckpt_dir, like=state.params)
        import numpy as np

        np.testing.assert_array_equal(
            np.asarray(restored["embed"]), np.asarray(state.params["embed"])
        )

    def test_caption_jsonl(self, tmp_path):
        import json

        import numpy as np
        from PIL import Image

        from captionax.cli.caption import main

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        rs = np.random.RandomState(0)
        for i in range(5):
            Image.fromarray(
                rs.randint(0, 255, (64, 80, 3), np.uint8)
            ).save(img_dir / f"im{i}.jpg")
        out = tmp_path / "caps.jsonl"
        n = main(args(tmp_path, "--images", str(img_dir),
                      "--out", str(out), "--styles", "factual,humour"))
        lines = [json.loads(x) for x in out.read_text().splitlines()]
        assert n == len(lines) == 10
        assert {x["style"] for x in lines} == {"factual", "humour"}
        assert all("caption" in x and "score" in x for x in lines)

        n2 = main(args(tmp_path, "--images", str(img_dir),
                       "--out", str(out), "--decode", "greedy"))
        lines = [json.loads(x) for x in out.read_text().splitlines()]
        assert n2 == len(lines) == 5
        assert all("caption" in x for x in lines)

    def test_caption_mixed_style_requests(self, tmp_path):
        """--requests: arbitrary per-image styles in one mixed stream."""
        import json

        import numpy as np
        from PIL import Image

        from captionax.cli.caption import main

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        rs = np.random.RandomState(1)
        for i in range(5):
            Image.fromarray(
                rs.randint(0, 255, (64, 80, 3), np.uint8)
            ).save(img_dir / f"im{i}.jpg")
        reqs = tmp_path / "reqs.jsonl"
        want = [("im0.jpg", "humour"), ("im1.jpg", "factual"),
                ("im2.jpg", "romantic"), ("im3.jpg", "factual"),
                ("im4.jpg", "humour"), ("im0.jpg", "romantic")]
        reqs.write_text("\n".join(
            json.dumps({"image": n, "style": s}) for n, s in want
        ))
        out = tmp_path / "caps.jsonl"
        n = main(args(tmp_path, "--images", str(img_dir),
                      "--requests", str(reqs), "--out", str(out)))
        lines = [json.loads(x) for x in out.read_text().splitlines()]
        assert n == len(lines) == len(want)
        assert [(x["image"], x["style"]) for x in lines] == want
        assert all("caption" in x and "score" in x for x in lines)

    def test_build_vocab(self, tmp_path):
        from captionax.cli.build_vocab import main

        out = tmp_path / "vocab.pkl"
        vocab = main(["--out", str(out),
                      "--factual", "/root/reference/data/factual_train.txt"])
        assert out.exists() and len(vocab) > 1000

    def test_classifier_warm_start(self, tmp_path):
        """--warm-start trunk donation (the essence-above-chance levers,
        BASELINE.md): a style3 trunk initializes the essence trunk when
        dims match, and a dims mismatch fails loudly."""
        from captionax.cli.train_classifier import main as clf_main

        bert = ["--bert-hidden", "32", "--bert-layers", "2",
                "--styled-fixture"]
        donor = tmp_path / "style3.pkl"
        _, acc = clf_main(args(tmp_path, "--kind", "style3", *bert,
                               "--save", str(donor)))
        assert donor.exists() and 0.0 <= acc <= 1.0
        _, acc = clf_main(args(tmp_path, "--kind", "essence", *bert,
                               "--warm-start", str(donor)))
        assert 0.0 <= acc <= 1.0
        # SystemExit (not assert): the guard must survive `python -O`
        with pytest.raises(SystemExit, match="dims mismatch"):
            clf_main(args(tmp_path, "--kind", "essence",
                          "--bert-hidden", "64", "--bert-layers", "2",
                          "--styled-fixture", "--warm-start", str(donor)))


@pytest.mark.skipif(not SLOW, reason="set CAPTIONAX_SLOW_TESTS=1")
class TestLongTailClis:
    def test_train_labert(self, tmp_path):
        from captionax.cli.train_labert import main

        main(args(tmp_path, "--synthetic-images", "16"))

    def test_train_labert_pipe(self, tmp_path):
        # --pipe: BERT stack as a 4-stage GPipe schedule on the virtual
        # 8-device mesh (train step only; val stays sequential)
        from captionax.cli.train_labert import main

        main(args(tmp_path, "--synthetic-images", "16", "--hidden", "32",
                  "--bert-layers", "4", "--bert-heads", "4",
                  "--pipe", "4", "--pipe-micro", "2"))

    def test_train_labert_seq(self, tmp_path):
        # --seq: BERT token axis sharded over 4 devices (ring schedule);
        # text columns pad-extended so 49+T divides by 4
        from captionax.cli.train_labert import main

        main(args(tmp_path, "--synthetic-images", "16", "--hidden", "32",
                  "--bert-layers", "4", "--bert-heads", "4",
                  "--seq", "4", "--seq-ring"))

    def test_train_catr(self, tmp_path):
        from captionax.cli.train_catr import main

        main(args(tmp_path))

    def test_train_catr_pipe(self, tmp_path):
        # --pipe: both DETR halves as 4-stage GPipe schedules on the
        # virtual 8-device mesh (train step only)
        from captionax.cli.train_catr import main

        main(args(tmp_path, "--hidden", "32", "--heads", "4",
                  "--enc-layers", "4", "--dec-layers", "4",
                  "--pipe", "4", "--pipe-micro", "2"))

    def test_train_hyper_combine(self, tmp_path):
        from captionax.cli.train_hyper_combine import main

        main(args(tmp_path, "--cc-captions", str(_cc_file(tmp_path))))

    def test_train_hyper_combine_aux_recipe(self, tmp_path):
        """The combined separation recipe end-to-end at tiny dims:
        4-class style-aux loss (probe class from batch['probe_cls']) +
        beam-matched margin checkpoint selection."""
        import pickle

        import jax
        import numpy as np

        from captionax.cli.common import resolve_vocab
        from captionax.core.config import DataConfig
        from captionax.models.classifiers import small_style_classifier_init

        vocab = resolve_vocab(DataConfig())
        probe = small_style_classifier_init(
            jax.random.PRNGKey(0), len(vocab), 16, 4)
        probe = jax.tree_util.tree_map(np.asarray, probe)
        probe_path = tmp_path / "probe4.pkl"
        with open(probe_path, "wb") as f:
            pickle.dump(probe, f)

        from captionax.cli.train_hyper_combine import main

        hist = main(args(tmp_path, "--cc-captions", str(_cc_file(tmp_path)),
                         "--style-aux", "--skip-val-quality",
                         "--select-sep-margin",
                         "--style-classifier", str(probe_path)))
        assert hist is not None
        # the margin monitor must have been computed every epoch
        assert all("val_sep_margin" in h for h in hist.values())

    def test_train_cc(self, tmp_path):
        from captionax.cli.train_cc import main

        # no egress in tests: the fetcher is off, so every image takes the
        # deterministic stock-photo fallback (reference train_cc.py:98-103)
        main(args(tmp_path, "--gcc-tsv", str(_gcc_tsv(tmp_path))))

    def test_cc_train_gru(self, tmp_path):
        from captionax.cli.cc_train_gru import main

        main(args(tmp_path, "--cc-captions", str(_cc_file(tmp_path))))

    def test_train_captioning(self, tmp_path):
        from captionax.cli.train_captioning import main

        main(args(tmp_path))

    def test_train_init(self, tmp_path):
        from captionax.cli.train_init import main

        main(args(tmp_path))

    def test_train_hypernet_init_hn(self, tmp_path):
        # the pretrain-then-finetune flow: distill (train_init), then
        # warm-start hypernet training from the distilled checkpoint
        from captionax.cli.train_hypernet import main as train_hn
        from captionax.cli.train_init import main as train_init

        train_init(args(tmp_path))
        train_hn(args(tmp_path, "--init-hn", str(tmp_path / "ckpt"),
                      "--checkpoint-dir", str(tmp_path / "ckpt2")))

    def test_test_all(self, tmp_path):
        from captionax.cli.test_all import main

        main(args(tmp_path, "--cc-captions", str(_cc_file(tmp_path))))


def test_scale_check(capsys):
    """gru kind at tiny dims over the conftest 8-device CPU mesh; the
    hypernet/pipe kinds run in the driver dryrun and docs examples."""
    from captionax.cli.scale_check import main

    main(["--kind", "gru", "--mesh-data", "4", "--mesh-model", "2",
          "--vocab-size", "64", "--num-features", "16",
          "--feature-size", "8", "--embed-size", "8",
          "--hidden-size", "8"])
    out = capsys.readouterr().out
    assert "scale_check OK" in out
    assert "data4 x model2" in out
