"""Deterministic fabricated state_dicts for the torch-weight converters.

Real pretrained weights are not downloadable in this image
(/root/reference/models/encoder.py:12 ``pretrained=True``), so the
converter paths (torchvision resnet -> folded-BN NHWC pytree; HF
BertModel -> trunk pytree) are pinned by goldens instead: the
state_dicts below are generated from a fixed numpy seed in the
torchvision / HF naming layouts, and tests/fixtures/converter_goldens/
holds the expected model outputs.  Regenerate with

    python tests/fixtures/generate_converter_goldens.py
"""

import os

import numpy as np

FIXTURE_DIR = os.path.dirname(os.path.abspath(__file__))
GOLDEN_DIR = os.path.join(FIXTURE_DIR, "converter_goldens")

RESNET_DEPTH = 50
RESNET_BLOCKS = (3, 4, 6, 3)
BERT_HIDDEN, BERT_LAYERS, BERT_VOCAB, BERT_HEADS = 32, 2, 101, 4


def fabricate_resnet_state_dict(seed: int = 0):
    """torchvision resnet-50 tensor layout, values from a fixed RNG.
    BN statistics are non-trivial so the folding math is exercised."""
    rs = np.random.RandomState(seed)

    sd = {}

    def conv(name, cin, cout, k):
        sd[name + ".weight"] = (
            rs.randn(cout, cin, k, k).astype(np.float32)
            * np.sqrt(2.0 / (k * k * cout))
        )

    def bn(name, c):
        sd[name + ".weight"] = rs.uniform(0.5, 1.5, c).astype(np.float32)
        sd[name + ".bias"] = (rs.randn(c) * 0.1).astype(np.float32)
        sd[name + ".running_mean"] = (rs.randn(c) * 0.1).astype(np.float32)
        sd[name + ".running_var"] = rs.uniform(0.5, 1.5, c).astype(np.float32)

    conv("conv1", 3, 64, 7)
    bn("bn1", 64)
    cin = 64
    for s, (n_blocks, width) in enumerate(
        zip(RESNET_BLOCKS, (64, 128, 256, 512))
    ):
        cout = width * 4
        for b in range(n_blocks):
            pre = f"layer{s + 1}.{b}"
            conv(f"{pre}.conv1", cin, width, 1)
            bn(f"{pre}.bn1", width)
            conv(f"{pre}.conv2", width, width, 3)
            bn(f"{pre}.bn2", width)
            conv(f"{pre}.conv3", width, cout, 1)
            bn(f"{pre}.bn3", cout)
            if b == 0:
                conv(f"{pre}.downsample.0", cin, cout, 1)
                bn(f"{pre}.downsample.1", cout)
            cin = cout
    return sd


def fabricate_bert_state_dict(seed: int = 1):
    """HF BertModel tensor layout at tiny dims."""
    rs = np.random.RandomState(seed)
    h, v = BERT_HIDDEN, BERT_VOCAB
    sd = {}

    def lin(name, cin, cout):
        sd[name + ".weight"] = (rs.randn(cout, cin) * 0.05).astype(np.float32)
        sd[name + ".bias"] = (rs.randn(cout) * 0.02).astype(np.float32)

    def ln(name, c):
        sd[name + ".weight"] = rs.uniform(0.8, 1.2, c).astype(np.float32)
        sd[name + ".bias"] = (rs.randn(c) * 0.02).astype(np.float32)

    sd["embeddings.word_embeddings.weight"] = (
        rs.randn(v, h) * 0.05
    ).astype(np.float32)
    sd["embeddings.position_embeddings.weight"] = (
        rs.randn(64, h) * 0.05
    ).astype(np.float32)
    sd["embeddings.token_type_embeddings.weight"] = (
        rs.randn(2, h) * 0.05
    ).astype(np.float32)
    ln("embeddings.LayerNorm", h)
    for i in range(BERT_LAYERS):
        p = f"encoder.layer.{i}"
        lin(f"{p}.attention.self.query", h, h)
        lin(f"{p}.attention.self.key", h, h)
        lin(f"{p}.attention.self.value", h, h)
        lin(f"{p}.attention.output.dense", h, h)
        ln(f"{p}.attention.output.LayerNorm", h)
        lin(f"{p}.intermediate.dense", h, 4 * h)
        lin(f"{p}.output.dense", 4 * h, h)
        ln(f"{p}.output.LayerNorm", h)
    lin("pooler.dense", h, h)
    return sd


def resnet_golden_input():
    rs = np.random.RandomState(7)
    # pre-normalized NHWC input (converter goldens pin the trunk math,
    # not the preprocessing)
    return rs.randn(1, 64, 64, 3).astype(np.float32)


def bert_golden_input():
    rs = np.random.RandomState(8)
    ids = rs.randint(0, BERT_VOCAB, (2, 12)).astype(np.int32)
    mask = np.ones((2, 12), np.float32)
    mask[1, 8:] = 0.0
    return ids, mask


def compute_resnet_features():
    import jax.numpy as jnp

    from captionax.models.encoder import encoder_cnn, from_torch_state_dict

    params = from_torch_state_dict(
        fabricate_resnet_state_dict(), depth=RESNET_DEPTH
    )
    return np.asarray(
        encoder_cnn(params, resnet_golden_input(), compute_dtype=jnp.float32)
    )


def compute_bert_outputs():
    from captionax.models.classifiers import (
        bert_trunk_apply,
        bert_trunk_from_hf_state_dict,
    )

    params = bert_trunk_from_hf_state_dict(
        fabricate_bert_state_dict(), hidden=BERT_HIDDEN,
        num_layers=BERT_LAYERS,
    )
    ids, mask = bert_golden_input()
    seq, pooled = bert_trunk_apply(params, ids, mask, num_heads=BERT_HEADS)
    return np.asarray(seq), np.asarray(pooled)
