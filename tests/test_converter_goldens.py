"""Committed goldens for the torch-weight converters.

Pretrained torchvision / HF weights cannot be downloaded in this image,
so converter correctness is pinned two ways: live-oracle parity against
raw torch modules (tests/test_encoder.py, tests/test_transformers.py)
AND these torch-free goldens — fabricated state_dicts in the exact
torchvision / HF tensor layouts (tests/fixtures/converter_fixture.py)
whose converted-model outputs must keep matching the committed arrays
across refactors.  Regenerate intentionally with
``python tests/fixtures/generate_converter_goldens.py``.
"""

import os

import numpy as np
import pytest

from tests.fixtures.converter_fixture import (
    GOLDEN_DIR,
    compute_bert_outputs,
    compute_resnet_features,
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLDEN_DIR), reason="converter goldens not generated"
)


class TestConverterGoldens:
    def test_resnet_from_torch_state_dict(self):
        golden = np.load(os.path.join(GOLDEN_DIR, "resnet_features.npy"))
        feats = compute_resnet_features()
        assert feats.shape == golden.shape == (1, 4, 2048)
        # tolerance: 50 conv layers of f32 reassociate differently across
        # XLA:CPU executables (AOT cache vs fresh compile) at ~1e-3
        # relative; a converter bug (folding, transpose, padding) is
        # orders of magnitude larger
        np.testing.assert_allclose(feats, golden, atol=5e-3, rtol=5e-3)
        # guard against a degenerate all-zero golden
        assert np.abs(golden).max() > 1e-3

    def test_bert_from_hf_state_dict(self):
        seq, pooled = compute_bert_outputs()
        g_seq = np.load(os.path.join(GOLDEN_DIR, "bert_seq.npy"))
        g_pooled = np.load(os.path.join(GOLDEN_DIR, "bert_pooled.npy"))
        np.testing.assert_allclose(seq, g_seq, atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(pooled, g_pooled, atol=2e-5, rtol=1e-5)
        assert np.abs(g_pooled).max() > 1e-3
