"""Regenerate the committed converter goldens (see converter_fixture.py).

    python tests/fixtures/generate_converter_goldens.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from tests.fixtures.converter_fixture import (  # noqa: E402
    GOLDEN_DIR,
    compute_bert_outputs,
    compute_resnet_features,
)


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    feats = compute_resnet_features()
    np.save(os.path.join(GOLDEN_DIR, "resnet_features.npy"),
            feats.astype(np.float32))
    seq, pooled = compute_bert_outputs()
    np.save(os.path.join(GOLDEN_DIR, "bert_seq.npy"), seq.astype(np.float32))
    np.save(os.path.join(GOLDEN_DIR, "bert_pooled.npy"),
            pooled.astype(np.float32))
    print("resnet features", feats.shape, "| bert", seq.shape, pooled.shape)


if __name__ == "__main__":
    main()
