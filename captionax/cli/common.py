"""Shared CLI plumbing: args, vocab/data resolution, model construction.

Every entry point mirrors a reference script but takes real flags instead
of hard-coded paths (/root/reference/cc_train_hypernet.py:361-370).  When
the image corpus isn't mounted (--synthetic, or missing paths), runs fall
back to deterministic synthetic images over the real caption text so the
full pipeline still executes end-to-end.
"""

from __future__ import annotations

import argparse
import os

from captionax.core.runtime import setup_runtime

setup_runtime()  # persistent compilation cache for every CLI

import jax

from captionax.core.config import (
    DataConfig,
    ModelConfig,
    TrainConfig,
    add_dataclass_args,
    dataclass_from_args,
)
from captionax.core.vocab import Vocab, build_vocab, load_vocab_pickle
from captionax.data.flickr import FlickrStyleData, load_factual_captions, load_styled_captions
from captionax.data.synthetic import synthetic_flickr_style
from captionax.models import decoder as dec
from captionax.models.encoder import resnet_init
from captionax.models.hypernet import hypernet_init


def make_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    add_dataclass_args(p, ModelConfig)
    add_dataclass_args(p, TrainConfig)
    add_dataclass_args(p, DataConfig)
    p.add_argument("--run-name", type=str, default="run")
    p.add_argument("--resume", type=str, default="")
    p.add_argument("--mesh-data", type=int, default=0,
                   help="shard batches (training steps, or serve "
                        "dispatches) over N devices on the 'data' mesh "
                        "axis (0 = single device); grads/collectives "
                        "ride ICI via GSPMD")
    return p


def resolve_mesh(args):
    """Build the data-parallel mesh requested by ``--mesh-data`` (None when
    unset).  The reference never ran its commented-out DDP
    (/root/reference/hypernet_attention.py:441, SURVEY §2.10); here
    multi-chip data parallelism is a CLI flag."""
    n = getattr(args, "mesh_data", 0)
    if not n:
        return None
    from captionax.parallel.mesh import make_mesh

    return make_mesh(n_data=n)


def parse_configs(args):
    return (
        dataclass_from_args(args, ModelConfig),
        dataclass_from_args(args, TrainConfig),
        dataclass_from_args(args, DataConfig),
    )


def resolve_vocab(data_cfg: DataConfig) -> Vocab:
    if os.path.exists(data_cfg.vocab_path):
        return load_vocab_pickle(data_cfg.vocab_path)
    # rebuild from caption files (build_vocab.py semantics)
    from captionax.core.vocab import extract_factual_caption_lines

    styled = []
    for path in (data_cfg.humour_captions, data_cfg.romantic_captions):
        if os.path.exists(path):
            styled.append(load_styled_captions(path))
    factual = (
        extract_factual_caption_lines(data_cfg.factual_captions)
        if os.path.exists(data_cfg.factual_captions)
        else None
    )
    return build_vocab(factual, styled)


def resolve_flickr_data(data_cfg: DataConfig, vocab, max_len: int) -> FlickrStyleData:
    have_images = os.path.isdir(data_cfg.img_dir) and any(
        os.scandir(data_cfg.img_dir)
    ) if os.path.isdir(data_cfg.img_dir) else False
    if data_cfg.synthetic or not have_images:
        factual_lines = None
        if os.path.exists(data_cfg.factual_captions):
            factual_lines = [
                c for _, c in load_factual_captions(data_cfg.factual_captions)
            ]
        return synthetic_flickr_style(
            num_images=data_cfg.synthetic_images,
            vocab=vocab,
            max_len=max_len,
            factual_lines=factual_lines,
            styled_fixture=data_cfg.styled_fixture,
        )
    from captionax.data.native_image import make_file_loader

    humour = (
        load_styled_captions(data_cfg.humour_captions)
        if os.path.exists(data_cfg.humour_captions) else []
    )
    romantic = (
        load_styled_captions(data_cfg.romantic_captions)
        if os.path.exists(data_cfg.romantic_captions) else []
    )
    return FlickrStyleData(
        factual=load_factual_captions(data_cfg.factual_captions),
        humour=humour,
        romantic=romantic,
        vocab=vocab,
        image_loader=make_file_loader(data_cfg.img_dir),
        max_len=max_len,
    )


def build_captioner(model_cfg: ModelConfig, vocab, key):
    return dec.attention_gru_init(
        key,
        model_cfg.num_features,
        model_cfg.feature_size,
        model_cfg.embed_size,
        model_cfg.hidden_size,
        len(vocab),
        num_layers=model_cfg.num_layers,
    )


def build_hypernet_model(model_cfg: ModelConfig, vocab, key, hyper_emb=None):
    k1, k2, k3 = jax.random.split(key, 3)
    model = {
        "decoder": build_captioner(model_cfg, vocab, k1),
        "hn": hypernet_init(
            k2,
            hyper_emb=hyper_emb or model_cfg.embed_size,
            input_dim=model_cfg.embed_size + model_cfg.feature_size,
            hidden_dim=model_cfg.hidden_size,
            N=model_cfg.hn_n,
            M=model_cfg.hn_m,
        ),
    }
    if model_cfg.dedicated_style_tokens:
        # 3-row style table (deviation, see steps.dedicated_style_embed)
        from captionax.models.layers import embedding_init

        model["style_embed"] = embedding_init(k3, 3, model_cfg.embed_size)
    return model


def build_encoder(model_cfg: ModelConfig, key, torch_weights: str = ""):
    if torch_weights and os.path.exists(torch_weights):
        import torch

        from captionax.models.encoder import from_torch_state_dict

        sd = torch.load(torch_weights, map_location="cpu")
        return from_torch_state_dict(sd, depth=model_cfg.encoder_depth)
    return resnet_init(key, depth=model_cfg.encoder_depth)


def maybe_load_glove(params, data_cfg: DataConfig, vocab, embed_size: int):
    """GloVe init of the decoder embedding (load_glove_emb,
    hypernet_attention.py:102-109) when the vectors file exists."""
    if data_cfg.glove_path and os.path.exists(data_cfg.glove_path):
        from captionax.data.glove import glove_embedding_matrix

        mat = glove_embedding_matrix(data_cfg.glove_path, vocab, embed_size)
        target = params["decoder"] if "decoder" in params else params
        target["embed"] = mat
    return params


def make_feature_fn(encode, train_cfg):
    """Per-batch featurizer for the CLIs that do not run through
    CaptionTrainer (train_labert / train_catr / train_lstm): honors
    --cache-features / --cache-features-device with the same
    FeatureCache the harness uses (encoder runs once per image; the
    device variant serves warm batches from an HBM-resident f16 table —
    BASELINE.md measured ~7x warm-epoch speedup through the relay)."""
    if not (train_cfg.cache_features or train_cfg.cache_features_device):
        return lambda batch: encode(batch["images"])
    from captionax.train.harness import FeatureCache

    cache = FeatureCache(lambda _p, imgs: encode(imgs), {},
                         device=train_cfg.cache_features_device)

    def feature_fn(batch):
        if "indices" in batch:
            return cache.featurize(
                lambda: batch["images"], batch["indices"]
            )
        return encode(batch["images"])

    return feature_fn
