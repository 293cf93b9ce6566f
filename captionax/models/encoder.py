"""CNN image encoders: the ResNet family in pure JAX, NHWC, TPU-first.

Reference parity (/root/reference/models/encoder.py):
- ``EncoderCNN``  — frozen ResNet-152 minus avgpool/fc ->
  [B, H/32*W/32, 2048] region tokens (49 at 224^2) — used by every
  attention model;
- ``Encoder``     — frozen ResNet-101 + adaptive-pool to (14,14) ->
  [B, 14, 14, 2048];
- ``EncoderLstm`` — frozen ResNet-50 + trainable Linear(2048, E) +
  BatchNorm1d -> [B, E] global feature.

Design: the reference freezes the CNN entirely (encoder.py:12-13; the
``Encoder.fine_tune`` hook at encoder.py:63-73 defaults to ``False`` and
no reference trainer ever enables it), so the TPU implementation folds
every BatchNorm into a per-channel scale/bias at weight-conversion time
and runs inference-only — one less HBM round-trip per BN and a pure
conv+scale+relu chain XLA fuses onto the MXU.  Compute dtype is bfloat16
by default (weights stay f32; outputs are f32).

Pretrained torchvision weights are not downloadable in this image; use
:func:`from_torch_state_dict` to convert a user-supplied state_dict
(tensor names follow torchvision's resnet layout), or random init for
fixtures and benchmarks.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}
STAGE_WIDTH = (64, 128, 256, 512)
EXPANSION = 4


def _conv_init(key, kh, kw, cin, cout, dtype=jnp.float32):
    """He-normal fan_out init (torchvision's conv init)."""
    std = math.sqrt(2.0 / (kh * kw * cout))
    return jax.random.normal(key, (kh, kw, cin, cout), dtype) * std


def _bn_identity(cout, dtype=jnp.float32):
    return {"scale": jnp.ones((cout,), dtype), "bias": jnp.zeros((cout,), dtype)}


def _conv_bn_init(key, kh, kw, cin, cout):
    return {"kernel": _conv_init(key, kh, kw, cin, cout), **_bn_identity(cout)}


def resnet_init(key, depth: int = 152) -> Dict:
    """Random-init ResNet params (bottleneck blocks, folded-BN layout)."""
    counts = BLOCKS[depth]
    keys = iter(jax.random.split(key, 4 + sum(counts) * 4))
    params: Dict = {"stem": _conv_bn_init(next(keys), 7, 7, 3, 64)}
    cin = 64
    stages: List = []
    for s, (n_blocks, width) in enumerate(zip(counts, STAGE_WIDTH)):
        cout = width * EXPANSION
        blocks = []
        for b in range(n_blocks):
            block = {
                "conv1": _conv_bn_init(next(keys), 1, 1, cin, width),
                "conv2": _conv_bn_init(next(keys), 3, 3, width, width),
                "conv3": _conv_bn_init(next(keys), 1, 1, width, cout),
            }
            # zero the block-output scale (torchvision zero_init_residual):
            # without real BN statistics, dozens of residual adds at scale 1
            # blow random-init activations up exponentially
            block["conv3"]["scale"] = jnp.zeros_like(block["conv3"]["scale"])
            if b == 0:
                block["downsample"] = _conv_bn_init(next(keys), 1, 1, cin, cout)
            blocks.append(block)
            cin = cout
        stages.append(blocks)
    params["stages"] = stages
    return params


def _conv(x, p, stride=1, dtype=jnp.bfloat16):
    # torch pads symmetrically (kh//2 each side); XLA "SAME" pads
    # asymmetrically under stride 2, so spell the padding out
    kh, kw = p["kernel"].shape[:2]
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        p["kernel"].astype(dtype),
        window_strides=(stride, stride),
        padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y * p["scale"].astype(dtype) + p["bias"].astype(dtype)


def resnet_stem(p: Dict, images: jnp.ndarray,
                compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """7x7/2 conv + relu + 3x3/2 maxpool (torch pads 3 / 1 per side).

    Perf note (benchmarks/encoder_profile.py): an MLPerf-style
    space-to-depth rewrite of the 3-channel conv measured NO gain here —
    XLA's TPU conv lowering already handles the thin input channel; the
    stem's residual cost is maxpool/layout-bound.
    """
    x = jnp.pad(images, ((0, 0), (3, 3), (3, 3), (0, 0)))
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        p["kernel"].astype(compute_dtype),
        (2, 2),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = jax.nn.relu(
        y * p["scale"].astype(compute_dtype) + p["bias"].astype(compute_dtype)
    )
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def resnet_apply(
    params: Dict,
    images: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """images [B, H, W, 3] (already normalized) -> [B, H/32, W/32, 2048]."""
    x = resnet_stem(params["stem"], images, compute_dtype)
    for s, blocks in enumerate(params["stages"]):
        for b, block in enumerate(blocks):
            stride = 2 if (s > 0 and b == 0) else 1
            identity = x
            y = jax.nn.relu(_conv(x, block["conv1"], 1, compute_dtype))
            y = jax.nn.relu(_conv(y, block["conv2"], stride, compute_dtype))
            y = _conv(y, block["conv3"], 1, compute_dtype)
            if "downsample" in block:
                identity = _conv(x, block["downsample"], stride, compute_dtype)
            x = jax.nn.relu(y + identity)
    return x.astype(jnp.float32)


def encoder_cnn(
    params: Dict, images: jnp.ndarray, compute_dtype=jnp.bfloat16
) -> jnp.ndarray:
    """EncoderCNN semantics: feature map flattened to region tokens
    [B, (H/32)*(W/32), 2048] (encoder.py:18-26)."""
    fmap = resnet_apply(params, images, compute_dtype)
    B, h, w, C = fmap.shape
    return fmap.reshape(B, h * w, C)


def adaptive_avg_pool(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d over NHWC: output[i] averages input rows
    floor(i*H/out) .. ceil((i+1)*H/out)-1 (handles upsampling too)."""
    B, H, W, C = x.shape
    oh, ow = out_hw

    def pool_axis(arr, in_size, out_size, axis):
        segments = []
        for i in range(out_size):
            lo = (i * in_size) // out_size
            hi = -(-((i + 1) * in_size) // out_size)
            seg = jax.lax.slice_in_dim(arr, lo, hi, axis=axis)
            segments.append(seg.mean(axis=axis, keepdims=True))
        return jnp.concatenate(segments, axis=axis)

    x = pool_axis(x, H, oh, 1)
    return pool_axis(x, W, ow, 2)


def encoder_pooled(params: Dict, images: jnp.ndarray, size: int = 14) -> jnp.ndarray:
    """Encoder semantics (encoder.py:28-61): ResNet trunk + adaptive pool
    to (size, size) -> [B, size, size, 2048]."""
    return adaptive_avg_pool(resnet_apply(params, images), (size, size))


# ------------------------------------------------- EncoderLstm (global) --
def encoder_lstm_init(key, embed_size: int, depth: int = 50) -> Dict:
    """ResNet-50 trunk + trainable Linear(2048, E) + BatchNorm1d
    (encoder.py:114-132; linear init N(0, 0.02), bias 0)."""
    k1, k2 = jax.random.split(key)
    return {
        "resnet": resnet_init(k1, depth),
        "embed": {
            "w": jax.random.normal(k2, (512 * EXPANSION, embed_size)) * 0.02,
            "b": jnp.zeros((embed_size,)),
        },
        "bn": {
            "gamma": jnp.ones((embed_size,)),
            "beta": jnp.zeros((embed_size,)),
        },
    }


def encoder_lstm_apply(
    params: Dict,
    images: jnp.ndarray,
    train: bool = True,
    running_stats: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    momentum: float = 0.01,
    eps: float = 1e-5,
):
    """-> ([B, E] feature, updated running stats)."""
    fmap = resnet_apply(params["resnet"], images)
    pooled = fmap.mean(axis=(1, 2))  # global average pool
    feat = pooled @ params["embed"]["w"] + params["embed"]["b"]
    if running_stats is None:
        running_stats = (jnp.zeros_like(feat[0]), jnp.ones_like(feat[0]))
    r_mean, r_var = running_stats
    if train:
        mean = feat.mean(axis=0)
        var = feat.var(axis=0)
        n = feat.shape[0]
        r_mean = (1 - momentum) * r_mean + momentum * mean
        r_var = (1 - momentum) * r_var + momentum * var * n / max(n - 1, 1)
    else:
        mean, var = r_mean, r_var
    out = (feat - mean) / jnp.sqrt(var + eps)
    out = out * params["bn"]["gamma"] + params["bn"]["beta"]
    return out, (r_mean, r_var)


# ------------------------------------------------- int8 inference path --
def resnet_quantize(params: Dict, act_scales: Optional[Dict] = None) -> Dict:
    """Quantize a folded-BN ResNet for int8 inference serving.

    Per-conv: the BN scale folds into the kernel (exact in f32), then the
    folded kernel quantizes symmetrically per OUTPUT channel to int8.
    Biases and the stem stay as-is (the 3-input-channel stem conv gains
    nothing from the int8 MXU mode and runs bf16).

    ``act_scales`` (from :func:`resnet_calibrate`) stores a STATIC
    per-conv activation max: the quantize/dequantize chain then becomes
    pure elementwise work XLA fuses into the conv epilogues.  Without it
    the apply path falls back to dynamic per-tensor scales, which insert
    a full-tensor max reduce (an unfused memory pass) before every conv
    — measured SLOWER than bf16 end-to-end on v5e (0.77x) even though
    the int8 convs themselves run 2.4x faster.  Calibrate for serving.

    Rationale: the reference freezes its CNNs outright
    (/root/reference/models/encoder.py:12-13), so serving-time encoder
    weights are static — ideal for quantization.  On TPU v5e the int8
    systolic-array mode doubles peak over bf16
    (benchmarks/encoder_profile.py --int8).
    """
    def quantize_conv(p, ascale):
        folded = p["kernel"].astype(jnp.float32) * p["scale"].astype(
            jnp.float32
        )
        wscale = jnp.maximum(
            jnp.max(jnp.abs(folded), axis=(0, 1, 2)) / 127.0, 1e-12
        )
        q = jnp.clip(jnp.round(folded / wscale), -127, 127).astype(jnp.int8)
        out = {"q": q, "wscale": wscale,
               "bias": p["bias"].astype(jnp.float32)}
        if ascale is not None:
            out["ascale"] = jnp.maximum(
                jnp.asarray(ascale, jnp.float32) / 127.0, 1e-12
            )
        return out

    out: Dict = {"stem": params["stem"]}
    out["stages"] = [
        [
            {
                k: quantize_conv(
                    v,
                    None
                    if act_scales is None
                    else act_scales["stages"][s][b][k],
                )
                for k, v in block.items()
            }
            for b, block in enumerate(blocks)
        ]
        for s, blocks in enumerate(params["stages"])
    ]
    return out


def resnet_calibrate(
    params: Dict, images: jnp.ndarray, compute_dtype=jnp.bfloat16
) -> Dict:
    """Run the f32/bf16 forward on a calibration batch and record each
    conv's input max — the static activation scales for
    :func:`resnet_quantize`.  Inputs outside the calibrated range clip
    at serving time, so calibrate on representative (preprocessed)
    images."""
    scales: Dict = {"stages": []}
    x = resnet_stem(params["stem"], images, compute_dtype)

    def amax(t):
        return jnp.max(jnp.abs(t)).astype(jnp.float32)

    for s, blocks in enumerate(params["stages"]):
        stage_scales = []
        for b, block in enumerate(blocks):
            stride = 2 if (s > 0 and b == 0) else 1
            rec = {"conv1": amax(x)}
            identity = x
            y = jax.nn.relu(_conv(x, block["conv1"], 1, compute_dtype))
            rec["conv2"] = amax(y)
            y = jax.nn.relu(_conv(y, block["conv2"], stride, compute_dtype))
            rec["conv3"] = amax(y)
            y = _conv(y, block["conv3"], 1, compute_dtype)
            if "downsample" in block:
                rec["downsample"] = rec["conv1"]
                identity = _conv(x, block["downsample"], stride, compute_dtype)
            x = jax.nn.relu(y + identity)
            stage_scales.append(rec)
        scales["stages"].append(stage_scales)
    return scales


def _qconv(x, qp, stride=1, compute_dtype=jnp.bfloat16):
    """Activation quant (static scale if calibrated, else dynamic) ->
    int8 conv -> dequant+bias."""
    if "ascale" in qp:
        ascale = qp["ascale"]
    else:
        ascale = jnp.maximum(
            jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0, 1e-12
        )
    qx = jnp.clip(
        jnp.round(x.astype(jnp.float32) / ascale), -127, 127
    ).astype(jnp.int8)
    kh, kw = qp["q"].shape[:2]
    y = jax.lax.conv_general_dilated(
        qx,
        qp["q"],
        window_strides=(stride, stride),
        padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    deq = y.astype(jnp.float32) * (ascale * qp["wscale"]) + qp["bias"]
    return deq.astype(compute_dtype)


def resnet_apply_int8(
    qparams: Dict,
    images: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """int8 twin of :func:`resnet_apply` over :func:`resnet_quantize` output.

    Residual adds and relus stay in ``compute_dtype``; every bottleneck
    conv runs int8 x int8 -> int32 on the MXU's double-rate path.
    """
    x = resnet_stem(qparams["stem"], images, compute_dtype)
    for s, blocks in enumerate(qparams["stages"]):
        for b, block in enumerate(blocks):
            stride = 2 if (s > 0 and b == 0) else 1
            identity = x
            y = jax.nn.relu(_qconv(x, block["conv1"], 1, compute_dtype))
            y = jax.nn.relu(_qconv(y, block["conv2"], stride, compute_dtype))
            y = _qconv(y, block["conv3"], 1, compute_dtype)
            if "downsample" in block:
                identity = _qconv(x, block["downsample"], stride, compute_dtype)
            x = jax.nn.relu(y + identity)
    return x.astype(jnp.float32)


def encoder_cnn_int8(
    qparams: Dict, images: jnp.ndarray, compute_dtype=jnp.bfloat16
) -> jnp.ndarray:
    """EncoderCNN semantics over the int8 trunk -> [B, 49, 2048] tokens."""
    fmap = resnet_apply_int8(qparams, images, compute_dtype)
    B, h, w, C = fmap.shape
    return fmap.reshape(B, h * w, C)


# ------------------------------------------------- torch weight import --
def from_torch_state_dict(state_dict, depth: int = 152, eps: float = 1e-5) -> Dict:
    """Convert a torchvision resnet state_dict (tensors or numpy arrays)
    into the folded-BN NHWC pytree used here.

    Folding: y = gamma * (conv(x) - mean) / sqrt(var + eps) + beta
           = conv(x) * scale + bias,  scale = gamma/sqrt(var+eps),
                                      bias  = beta - mean*scale.
    """
    import numpy as np

    def arr(name):
        t = state_dict[name]
        return np.asarray(t.detach().numpy() if hasattr(t, "detach") else t)

    def conv_bn(conv_name, bn_name):
        kernel = arr(conv_name + ".weight").transpose(2, 3, 1, 0)  # OIHW->HWIO
        gamma = arr(bn_name + ".weight")
        beta = arr(bn_name + ".bias")
        mean = arr(bn_name + ".running_mean")
        var = arr(bn_name + ".running_var")
        scale = gamma / np.sqrt(var + eps)
        return {
            "kernel": jnp.asarray(kernel),
            "scale": jnp.asarray(scale),
            "bias": jnp.asarray(beta - mean * scale),
        }

    params: Dict = {"stem": conv_bn("conv1", "bn1")}
    stages: List = []
    for s, n_blocks in enumerate(BLOCKS[depth]):
        blocks = []
        for b in range(n_blocks):
            pre = f"layer{s + 1}.{b}"
            block = {
                "conv1": conv_bn(f"{pre}.conv1", f"{pre}.bn1"),
                "conv2": conv_bn(f"{pre}.conv2", f"{pre}.bn2"),
                "conv3": conv_bn(f"{pre}.conv3", f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in state_dict:
                block["downsample"] = conv_bn(
                    f"{pre}.downsample.0", f"{pre}.downsample.1"
                )
            blocks.append(block)
        stages.append(blocks)
    params["stages"] = stages
    return params
