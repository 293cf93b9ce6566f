"""Import trained reference checkpoints (PyTorch Lightning ``.ckpt``).

The migration path for users of the reference repo: bring a checkpoint
trained by ``train_attention_gru.py`` (``CaptionAttentionGru``,
/root/reference/train_attention_gru.py:32-52), ``hypernet_attention.py``
(``HyperNet``, /root/reference/hypernet_attention.py:32-101) or
``cc_train_hypernet.py`` (``HyperNetCC``,
/root/reference/cc_train_hypernet.py:42-108) and evaluate / serve /
continue training it under captionax.

Every tensor is copied exactly (no re-initialization); ``nn.Linear``
weights transpose to the ``[in, out]`` JAX convention used by
:mod:`captionax.models.layers`; GRU cell tensors keep the torch
``[gates*H, in]`` layout that :func:`captionax.models.rnn.gru_cell`
consumes.  The frozen ResNet encoder inside the checkpoint
(``image_encoder.resnet.{0..7}`` — ``EncoderCNN`` wraps the torchvision
children ``[:-2]`` in an ``nn.Sequential``,
/root/reference/models/encoder.py:7-26) is remapped back to torchvision
names so :func:`captionax.models.encoder.from_torch_state_dict` can fold
its BatchNorms.

Not covered (no trained artifacts can exist for them in practice, and
the layouts are exercised elsewhere): the non-attention ``hypernet.py``
path over ``DecoderGRU``/``DecoderRNN`` and the LSTM trainers — open an
issue with a real checkpoint if you need one imported.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

Params = Dict[str, Any]

# gru.named_parameters() iteration order fixes the hn_heads indexing
# (hypernet_attention.py:68-99): weight_ih, weight_hh, bias_ih, bias_hh.
_GRU_TENSORS = ("w_ih", "w_hh", "b_ih", "b_hh")

# EncoderCNN's nn.Sequential(list(resnet.children())[:-2]) positions ->
# torchvision module names (relu/maxpool at 2/3 hold no tensors).
_RESNET_SEQ_NAMES = {
    "0": "conv1",
    "1": "bn1",
    "4": "layer1",
    "5": "layer2",
    "6": "layer3",
    "7": "layer4",
}


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _arr(sd: Dict, name: str) -> np.ndarray:
    """Tensors stay host-side numpy: conversion must not touch a device
    (importing through a TPU would ship every tensor over the wire and
    pin device shardings into the saved Orbax metadata, breaking
    cross-platform restore).  Consumers restore with ``like=`` or use
    the numpy tree directly — every captionax apply fn accepts numpy."""
    if name not in sd:
        raise KeyError(
            f"checkpoint is missing {name!r} — not a reference-layout "
            f"state_dict? (have e.g. {sorted(sd)[:4]})"
        )
    return np.asarray(_np(sd[name]), np.float32)


def _lin(sd: Dict, name: str) -> Params:
    """nn.Linear -> {'w' [in,out], 'b'} (transpose from torch [out,in])."""
    return {"w": _arr(sd, name + ".weight").T, "b": _arr(sd, name + ".bias")}


def _seq_mlp(sd: Dict, name: str, indices=(0, 2)) -> Params:
    """nn.Sequential of Linears (activations between) -> mlp pytree."""
    return {
        f"l{i}": _lin(sd, f"{name}.{idx}") for i, idx in enumerate(indices)
    }


def _gru_cell(sd: Dict, name: str) -> Params:
    return {
        "w_ih": _arr(sd, name + ".weight_ih"),
        "w_hh": _arr(sd, name + ".weight_hh"),
        "b_ih": _arr(sd, name + ".bias_ih"),
        "b_hh": _arr(sd, name + ".bias_hh"),
    }


def attention_gru_from_state_dict(
    sd: Dict, prefix: str = "captioner."
) -> Params:
    """``AttentionGru`` (/root/reference/models/decoderlstm.py:11-47) ->
    the :func:`captionax.models.decoder.attention_gru_init` pytree.

    ``feature_fc`` is ``Sequential(Linear, ReLU, Linear)`` (indices 0/2);
    ``attention`` is ``BahdanauAttention`` with W_a/U_a/v_a Linears
    (/root/reference/models/attention.py:5-20).
    """
    p = prefix
    params: Params = {
        "feature_fc": _seq_mlp(sd, p + "feature_fc"),
        "embed": _arr(sd, p + "embed.weight"),
        "gru": _gru_cell(sd, p + "gru"),
        "fc": _lin(sd, p + "fc"),
        "attention": {
            "W_a": _lin(sd, p + "attention.W_a"),
            "U_a": _lin(sd, p + "attention.U_a"),
            "v_a": _lin(sd, p + "attention.v_a"),
        },
        "init_h": _lin(sd, p + "init_h"),
    }
    # optional extra GRUCell layers (decoderlstm.py:34-35, num_layers>1)
    layers = []
    while f"{p}layers.{len(layers)}.weight_ih" in sd:
        layers.append(_gru_cell(sd, f"{p}layers.{len(layers)}"))
    if layers:
        params["layers"] = layers
    return params


def hypernet_from_state_dict(sd: Dict, prefix: str = "") -> Params:
    """``HyperNet`` base+heads (hypernet_attention.py:62-99) ->
    {'base', 'heads'} as built by
    :func:`captionax.models.hypernet.hypernet_init`.  ``hn_base`` is
    ``Sequential(Linear, LeakyReLU, Linear, LeakyReLU)`` (indices 0/2);
    each head is ``Sequential(Linear, LeakyReLU, Linear)``.
    """
    p = prefix
    return {
        "base": _seq_mlp(sd, p + "hn_base"),
        "heads": {
            name: _seq_mlp(sd, f"{p}hn_heads.{i}")
            for i, name in enumerate(_GRU_TENSORS)
        },
    }


def domain_embedder_from_state_dict(sd: Dict, prefix: str = "embed") -> Params:
    """``HyperNetCC.embed`` (cc_train_hypernet.py:86-106) -> the
    :meth:`captionax.data.domains.DomainEmbedder.init_params` pytree.

    Scheme is detected from the keys: ``embed.weight`` = learned
    'embedding' table; ``embed.0/2`` = histogram MLP; ``embed.0`` alone =
    JSD projection; nothing = 'one hot' (a plain tensor attribute, never
    in the state_dict).
    """
    if prefix + ".weight" in sd:
        return {"table": _arr(sd, prefix + ".weight")}
    if prefix + ".2.weight" in sd:
        return _seq_mlp(sd, prefix)
    if prefix + ".0.weight" in sd:
        return _seq_mlp(sd, prefix, indices=(0,))
    return {}


def encoder_state_dict_from_lightning(
    sd: Dict, prefix: str = "image_encoder.resnet."
) -> Dict[str, np.ndarray]:
    """Remap ``EncoderCNN``'s Sequential-indexed keys back to torchvision
    names (``0.weight`` -> ``conv1.weight``, ``4.0.conv1.weight`` ->
    ``layer1.0.conv1.weight``) for
    :func:`captionax.models.encoder.from_torch_state_dict`."""
    out: Dict[str, np.ndarray] = {}
    for key, value in sd.items():
        if not key.startswith(prefix):
            continue
        rest = key[len(prefix):]
        idx, _, tail = rest.partition(".")
        name = _RESNET_SEQ_NAMES.get(idx)
        if name is None:  # relu/maxpool hold no tensors; skip trackers
            continue
        out[f"{name}.{tail}" if tail else name] = _np(value)
    return out


def detect_kind(sd: Dict) -> str:
    """'gru' | 'hypernet' | 'hypernet_cc' from the state_dict keys."""
    if any(k.startswith("hypernet.") for k in sd):
        return "hypernet_cc"
    if any(k.startswith("hn_base.") for k in sd):
        return "hypernet"
    if any(k.startswith("captioner.gru.") for k in sd):
        return "gru"
    raise ValueError(
        "unrecognized checkpoint layout — expected CaptionAttentionGru, "
        "HyperNet (attention) or HyperNetCC keys; got e.g. "
        f"{sorted(sd)[:6]}"
    )


def import_lightning_state_dict(
    sd: Dict,
) -> Tuple[str, Params, Optional[Dict[str, np.ndarray]]]:
    """(kind, captionax params, torchvision-named encoder state_dict).

    The params tree matches what the corresponding captionax trainer
    checkpoints (cli/common.py build_captioner / build_hypernet_model /
    cli/cc_train_hypernet.py build_cc_model_and_embedder), so the output
    drops straight into ``cli/evaluate`` / ``CaptionTrainer``.
    """
    kind = detect_kind(sd)
    if kind == "gru":
        params: Params = attention_gru_from_state_dict(sd)
        enc_prefix = "image_encoder.resnet."
    elif kind == "hypernet":
        params = {
            "decoder": attention_gru_from_state_dict(sd),
            "hn": hypernet_from_state_dict(sd),
        }
        enc_prefix = "image_encoder.resnet."
    else:  # hypernet_cc — everything nests under `hypernet.`
        params = {
            "decoder": attention_gru_from_state_dict(sd, "hypernet.captioner."),
            "hn": hypernet_from_state_dict(sd, "hypernet."),
            "domain_emb": domain_embedder_from_state_dict(sd),
        }
        # train/val steps run self.hypernet.image_encoder
        # (cc_train_hypernet.py:151); both copies are the same frozen
        # pretrained trunk, prefer the one actually exercised
        enc_prefix = "hypernet.image_encoder.resnet."
        if not any(k.startswith(enc_prefix) for k in sd):
            enc_prefix = "image_encoder.resnet."
    encoder_sd = encoder_state_dict_from_lightning(sd, enc_prefix) or None
    return kind, params, encoder_sd


def load_lightning_checkpoint(path: str) -> Dict[str, Any]:
    """Read a Lightning ``.ckpt`` file (a torch.save zip holding
    'state_dict' + 'hyper_parameters') and convert it.

    Returns {'kind', 'params', 'encoder_state_dict', 'hparams'}.
    Requires torch (installed in this image) purely for deserialization.
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    kind, params, encoder_sd = import_lightning_state_dict(sd)
    hparams = blob.get("hyper_parameters", {}) if isinstance(blob, dict) else {}
    return {
        "kind": kind,
        "params": params,
        "encoder_state_dict": encoder_sd,
        "hparams": dict(hparams),
    }
