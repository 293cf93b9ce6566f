"""Native C++ CIDEr parity vs the Python implementation (itself verified
against the reference's vendored scorer)."""

import numpy as np
import pytest

from captionax.eval.cider import cider_score
from captionax.eval.cider_native import cider_score_native, native_available

HYPS = [
    "a child in a pink dress is climbing stairs",
    "a dog runs in the grass",
    "two men are playing chess in a park",
    "",  # empty hypothesis
]
REFS = [
    ["a child in a pink dress is climbing up a set of stairs",
     "a little girl climbing the stairs"],
    ["a dog runs after a ball in the green grass"],
    ["two men play chess outdoors in the park"],
    ["anything at all"],
]


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
class TestNativeCider:
    def test_parity_small(self):
        m_py, s_py = cider_score(HYPS, REFS)
        m_cc, s_cc = cider_score_native(HYPS, REFS)
        np.testing.assert_allclose(s_cc, s_py, atol=1e-12)
        assert abs(m_cc - m_py) < 1e-12

    def test_parity_real_corpus(self, ref_vocab):
        import os

        path = "/root/reference/data/factual_train.txt"
        if not os.path.exists(path):
            pytest.skip("reference data not mounted")
        from captionax.core.vocab import extract_factual_caption_lines

        lines = [l.strip().lower() for l in extract_factual_caption_lines(path)]
        hyps, refs = [], []
        for i in range(0, 500 * 5, 5):
            hyps.append(lines[i])
            refs.append([lines[i + j] for j in range(1, 5)])
        m_py, s_py = cider_score(hyps, refs)
        m_cc, s_cc = cider_score_native(hyps, refs)
        np.testing.assert_allclose(s_cc, s_py, atol=1e-10)

    def test_empty_batch(self):
        m, s = cider_score_native([], [])
        assert m == 0.0 and s.shape == (0,)

    def test_unicode(self):
        m_py, s_py = cider_score(["un chien très vite", "a b"],
                                 [["un chien très rapide"], ["a b"]])
        m_cc, s_cc = cider_score_native(["un chien très vite", "a b"],
                                        [["un chien très rapide"], ["a b"]])
        np.testing.assert_allclose(s_cc, s_py, atol=1e-12)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
class TestNativeTextEncoder:
    def test_full_corpus_parity(self, ref_vocab):
        import os

        from captionax.core.textenc_native import NativeCaptionEncoder

        path = "/root/reference/data/factual_train.txt"
        if not os.path.exists(path):
            pytest.skip("reference data not mounted")
        from captionax.core.vocab import extract_factual_caption_lines

        lines = [l.strip() for l in extract_factual_caption_lines(path)[:3000]]
        enc = NativeCaptionEncoder(ref_vocab)
        T = 40
        native = enc.encode_batch(lines, T)
        for i, line in enumerate(lines):
            ids = ref_vocab.encode(line)[:T]
            row = np.zeros(T, np.int32)
            row[: len(ids)] = ids
            np.testing.assert_array_equal(native[i], row)

    def test_edge_cases(self, ref_vocab):
        from captionax.core.textenc_native import NativeCaptionEncoder

        enc = NativeCaptionEncoder(ref_vocab)
        cases = [
            "",  # empty
            "A man's dog isn't here, really!",
            'She said "hello" (loudly) -- twice...',
            "children can't wait; they'll run & jump?",
            "x" * 500,  # longer than max_len
        ]
        T = 25
        out = enc.encode_batch(cases, T)
        for i, c in enumerate(cases):
            ids = ref_vocab.encode(c)[:T]
            row = np.zeros(T, np.int32)
            row[: len(ids)] = ids
            np.testing.assert_array_equal(out[i], row, err_msg=repr(c))
