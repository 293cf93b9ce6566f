"""Import/export trained checkpoints across the reference's PyTorch
Lightning layout (``.ckpt``).

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

The EXPORT direction (:func:`export_lightning_state_dict`,
``cli/export_checkpoint``) is the exact inverse: captionax-trained
params become a reference-layout state_dict that the reference's
modules ``load_state_dict(strict=True)`` and that round-trips through
:func:`import_lightning_state_dict` bit-exactly.  The folded-BN
encoder exports as conv kernels plus identity BatchNorm statistics
(mean=0, var=1-eps, weight=scale, bias=bias), which is
function-identical to the folded form.
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

# ---------------------------------------------------------------------------
# Export: captionax params -> reference-layout state_dict
# ---------------------------------------------------------------------------

def _lin_sd(sd: Dict, name: str, p: Params) -> None:
    """Inverse of :func:`_lin`: {'w' [in,out], 'b'} -> torch Linear keys."""
    sd[name + ".weight"] = np.asarray(p["w"], np.float32).T.copy()
    sd[name + ".bias"] = np.asarray(p["b"], np.float32).copy()


def _seq_mlp_sd(sd: Dict, name: str, p: Params, indices=(0, 2)) -> None:
    for i, idx in enumerate(indices):
        _lin_sd(sd, f"{name}.{idx}", p[f"l{i}"])


def _gru_sd(sd: Dict, name: str, p: Params) -> None:
    for ours, theirs in (("w_ih", "weight_ih"), ("w_hh", "weight_hh"),
                         ("b_ih", "bias_ih"), ("b_hh", "bias_hh")):
        sd[f"{name}.{theirs}"] = np.asarray(p[ours], np.float32).copy()


def attention_gru_to_state_dict(
    params: Params, prefix: str = "captioner."
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`attention_gru_from_state_dict` — keys load into
    the reference ``AttentionGru`` with ``strict=True``."""
    sd: Dict[str, np.ndarray] = {}
    p = prefix
    _seq_mlp_sd(sd, p + "feature_fc", params["feature_fc"])
    sd[p + "embed.weight"] = np.asarray(params["embed"], np.float32).copy()
    _gru_sd(sd, p + "gru", params["gru"])
    _lin_sd(sd, p + "fc", params["fc"])
    for name in ("W_a", "U_a", "v_a"):
        _lin_sd(sd, p + "attention." + name, params["attention"][name])
    _lin_sd(sd, p + "init_h", params["init_h"])
    for i, layer in enumerate(params.get("layers", [])):
        _gru_sd(sd, f"{p}layers.{i}", layer)
    return sd


def hypernet_to_state_dict(
    params: Params, prefix: str = ""
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`hypernet_from_state_dict` (hn_base + hn_heads
    in the reference's gru.named_parameters() head order)."""
    sd: Dict[str, np.ndarray] = {}
    _seq_mlp_sd(sd, prefix + "hn_base", params["base"])
    for i, name in enumerate(_GRU_TENSORS):
        _seq_mlp_sd(sd, f"{prefix}hn_heads.{i}", params["heads"][name])
    return sd


def domain_embedder_to_state_dict(
    emb: Params, prefix: str = "embed"
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`domain_embedder_from_state_dict` (scheme from
    the pytree shape, mirroring the key-based detection)."""
    sd: Dict[str, np.ndarray] = {}
    if not emb:
        return sd
    if "table" in emb:
        sd[prefix + ".weight"] = np.asarray(emb["table"], np.float32).copy()
    elif "l1" in emb:
        _seq_mlp_sd(sd, prefix, emb)
    else:
        _seq_mlp_sd(sd, prefix, emb, indices=(0,))
    return sd


def encoder_state_dict_from_params(
    enc_params: Dict, eps: float = 1e-5
) -> Dict[str, np.ndarray]:
    """Folded-BN encoder params -> torchvision-named state_dict.

    BatchNorms are emitted with identity statistics (running_mean=0,
    running_var=1-eps, weight=scale, bias=bias) so torchvision's
    ``y = (conv - mean)/sqrt(var + eps) * weight + bias`` reproduces the
    folded ``conv*scale + bias`` EXACTLY; re-importing through
    :func:`captionax.models.encoder.from_torch_state_dict` round-trips
    bit-identically.
    """
    sd: Dict[str, np.ndarray] = {}

    def conv_bn(conv_name: str, bn_name: str, p: Dict) -> None:
        # HWIO -> torch OIHW
        sd[conv_name + ".weight"] = np.transpose(
            np.asarray(p["kernel"], np.float32), (3, 2, 0, 1)).copy()
        n = p["scale"].shape[0]
        sd[bn_name + ".weight"] = np.asarray(p["scale"], np.float32).copy()
        sd[bn_name + ".bias"] = np.asarray(p["bias"], np.float32).copy()
        sd[bn_name + ".running_mean"] = np.zeros((n,), np.float32)
        sd[bn_name + ".running_var"] = np.full((n,), 1.0 - eps, np.float32)

    conv_bn("conv1", "bn1", enc_params["stem"])
    for s, blocks in enumerate(enc_params["stages"]):
        for b, block in enumerate(blocks):
            base = f"layer{s + 1}.{b}"
            for c in (1, 2, 3):
                conv_bn(f"{base}.conv{c}", f"{base}.bn{c}",
                        block[f"conv{c}"])
            if "downsample" in block:
                conv_bn(f"{base}.downsample.0", f"{base}.downsample.1",
                        block["downsample"])
    return sd


_RESNET_NAME_TO_SEQ = {v: k for k, v in _RESNET_SEQ_NAMES.items()}


def export_lightning_state_dict(
    kind: str,
    params: Params,
    encoder_params: Optional[Dict] = None,
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`import_lightning_state_dict`: captionax params
    (+ optionally the folded encoder) -> one reference-layout state_dict
    that :func:`detect_kind` recognizes and the reference Lightning
    modules load.  ``kind`` is 'gru' | 'hypernet' | 'hypernet_cc'.
    """
    if kind == "gru":
        sd = attention_gru_to_state_dict(params)
        enc_prefix = "image_encoder.resnet."
    elif kind == "hypernet":
        sd = attention_gru_to_state_dict(params["decoder"])
        sd.update(hypernet_to_state_dict(params["hn"]))
        enc_prefix = "image_encoder.resnet."
    elif kind == "hypernet_cc":
        sd = attention_gru_to_state_dict(params["decoder"],
                                         "hypernet.captioner.")
        sd.update(hypernet_to_state_dict(params["hn"], "hypernet."))
        sd.update(domain_embedder_to_state_dict(
            params.get("domain_emb", {})))
        enc_prefix = "hypernet.image_encoder.resnet."
    else:
        raise ValueError(f"unknown kind {kind!r}")
    if encoder_params is not None:
        for name, value in encoder_state_dict_from_params(
                encoder_params).items():
            mod, _, tail = name.partition(".")
            seq = _RESNET_NAME_TO_SEQ[mod]  # conv1/bn1/layerN all mapped
            sd[f"{enc_prefix}{seq}.{tail}"] = value
    return sd
