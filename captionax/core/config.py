"""Configuration dataclasses for models and training.

Replaces the reference's hard-coded ``__main__`` hparams and scattered
argparse (/root/reference/cc_train_hypernet.py:361-409,
train_captioning.py:18-32) with one typed config surface; every CLI maps
flags onto these.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field


@dataclass
class ModelConfig:
    # reference defaults: HyperNet(200, 200, 200, len(vocab), vocab)
    num_features: int = 2048
    feature_size: int = 200
    embed_size: int = 200
    hidden_size: int = 200
    vocab_size: int = 9684
    num_layers: int = 1
    dropout: float = 0.0
    # hypernet
    hyper_emb: int = 10
    hn_n: int = 1
    hn_m: int = 500
    # encoder
    encoder_depth: int = 152
    regions: int = 49
    # opt-in deviation: condition the hypernet on a dedicated 3-row
    # style table instead of the vocab token row.  The reference uses
    # vocab('humour') which is <unk> (build_vocab never sees the word
    # 'humour'), so humour's conditioning embedding is shared with every
    # OOV word and receives their gradients (hypernet_attention.py:139-142).
    # Off by default = exact reference semantics.
    dedicated_style_tokens: bool = False


@dataclass
class TrainConfig:
    lr: float = 5e-3
    batch_size: int = 64
    max_epochs: int = 20
    grad_clip: float = 5.0
    plateau_factor: float = 0.5
    plateau_patience: int = 10
    plateau_cooldown: int = 2
    teacher_forcing_prob: float = 0.0  # reference sample_prob semantics
    # run the exponential LR sweep before fit and install the suggested
    # LR (pl.Trainer auto_lr_find=True + trainer.tune, the reference's
    # default flow — train_attention_gru.py:330-342)
    auto_lr_find: bool = False
    lr_find_steps: int = 100
    seed: int = 0
    max_len: int = 25
    beam_size: int = 3
    beam_max_steps: int = 50
    mixup: bool = False
    mixup_alpha: float = 0.3
    # compute the mixup gradient as separate CE/style dispatches (exact
    # by linearity) instead of one fused grad graph — required on the
    # axon relay, whose AOT compile helper wedges on the fused graph at
    # production dims (CLAUDE.md); single-device only
    mixup_split: bool = False
    # style-identification auxiliary loss (captionax extension, no
    # reference equivalent): free-run under the batch's own theta and
    # CE the frozen style classifier's prediction against the true
    # style — pushes styles APART where mixup's interpolated targets
    # collapse them (measured A/B in BASELINE.md's separation table)
    style_aux: bool = False
    style_aux_alpha: float = 0.7  # loss = alpha*CE + (1-alpha)*aux
    # same relay workaround as mixup_split, for the style-aux grad
    style_aux_split: bool = False
    # aux probe class comes from batch['probe_cls'] instead of matching
    # batch['style_id'] against the 3 style ids — lets the aux loss
    # condition models whose batches are not style-keyed (the combined
    # Flickr+CC hypernet: classes factual/humour/romantic/CC against a
    # 4-class probe, train_hyper_combine + combine_study)
    style_aux_from_batch: bool = False
    # skip BLEU/METEOR/ROUGE/CIDEr on validation TF logits each epoch
    # (pure-Python, single-core: ~minutes per epoch on large val splits;
    # val_loss/val_loss_tf — the plateau + checkpoint monitors — are
    # unaffected)
    skip_val_quality: bool = False
    log_every: int = 20
    checkpoint_dir: str = "checkpoints"
    # which epoch-end metric BestCheckpointer monitors and its direction
    # (Lightning ModelCheckpoint(monitor=..., mode=...) equivalent; the
    # reference monitors val loss with mode min everywhere, e.g.
    # train_attention_gru.py's ModelCheckpoint) — epoch_end_metrics
    # hooks (train/harness.py fit) can supply custom metrics to monitor,
    # e.g. validation style separation for --style-aux runs
    select_metric: str = "val_loss_tf"
    select_mode: str = "min"
    metrics_every_epochs: int = 1
    # mixed-precision training: decoder matmuls/scan in bfloat16 with
    # f32 master weights + f32 CE (the reference trains f32 only;
    # opt-in TPU speedup, numerics differ slightly)
    bf16_compute: bool = False
    # run the teacher-forced recurrence as the Pallas fused fwd+BPTT
    # kernel (ops/train_kernel.py) instead of lax.scan — opt-in; the
    # 25-step recurrence is latency-bound in XLA (trainstep_roofline).
    # Scan-equality of values and all grads is test-enforced.
    fused_scan: bool = False
    # lax.scan unroll factor for the teacher-forced recurrence (1 =
    # exact reference loop; higher lets XLA pipeline the small per-step
    # matmuls across iterations, float-reassociation-level differences;
    # measured at B=1024/T=25: full unroll (>=T) -6% step time bf16,
    # -4.5% f32)
    scan_unroll: int = 1
    # cache frozen-encoder outputs per image in host RAM (bf16,
    # ~200 KB/image at 49x2048): the encoder then runs once per image
    # instead of every batch every epoch (the reference recomputes it,
    # train_attention_gru.py:105)
    cache_features: bool = False
    cache_features_device: bool = False
    # dump a jax.profiler trace of the fit loop to this directory
    # (view with TensorBoard/xprof; the reference has no profiling at
    # all — SURVEY §5); empty = off
    trace_dir: str = ""


@dataclass
class DataConfig:
    img_dir: str = "data/flickr7k_images"
    factual_captions: str = "data/factual_train.txt"
    humour_captions: str = "data/humor/funny_train.txt"
    romantic_captions: str = "data/romantic/romantic_train.txt"
    cc_captions: str = "data/200_conceptual_train.txt"
    cc_oneshot_captions: str = "data/one_shot_captions.txt"
    vocab_path: str = "data/vocab.pkl"
    glove_path: str = ""
    synthetic: bool = False
    synthetic_images: int = 64
    # derive humour/romantic lines from each image's real factual
    # caption via the deterministic styled fixture (the real styled
    # files are dangling symlinks in the snapshot) — gives the 3-style
    # hypernet a learnable, measurable style signal
    styled_fixture: bool = False
    domain_scheme: str = "one hot"
    n_tsne: int = 2


def add_dataclass_args(parser, cls, prefix: str = "") -> None:
    for f in dataclasses.fields(cls):
        name = f"--{prefix}{f.name.replace('_', '-')}"
        if f.type == "bool" or f.type is bool:
            parser.add_argument(name, action="store_true", default=f.default)
        else:
            typ = {"int": int, "float": float, "str": str}.get(str(f.type), str)
            parser.add_argument(name, type=typ, default=f.default)


def dataclass_from_args(args, cls, prefix: str = ""):
    kwargs = {}
    for f in dataclasses.fields(cls):
        attr = f"{prefix}{f.name}"
        if hasattr(args, attr):
            kwargs[f.name] = getattr(args, attr)
    return cls(**kwargs)
