"""Depth-Anything-V2-Small in pure JAX: DINOv2 ViT-S/14 + DPT head.

Reference usage: the HF ``depth-estimation`` pipeline with
``depth-anything/Depth-Anything-V2-Small-hf`` (components/
style_transfer_depth/style_transfer_depth.py:27, Style_a3.py:47 — the
reference loads it three times; here it is one cached pytree).

Architecture (HF config of that checkpoint):
* backbone: DINOv2 ViT-S/14 — patch 14, width 384, 12 layers, 6 heads,
  GELU MLP ×4, LayerScale, CLS token, learned pos embeddings (bicubic
  interpolation to the input grid); hidden states taken after layers
  {3, 6, 9, 12} (1-indexed).
* neck (DPT): per-stage linear reassemble to {48, 96, 192, 384} channels
  + resize (×4, ×2, ×1, ×½), 3×3 conv to fusion width 64, top-down fusion
  with pre-activation residual conv units.
* head: conv 64→32, ×2 upsample, conv 32→32 + ReLU, conv 32→1 + ReLU.

The estimator is fully jax-traceable end-to-end, so the depth-loss
stylization keeps it in-graph and differentiable (unlike the reference's
PIL round-trip, Style_a3.py:144-146).
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Dict, List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tbist_tpu.utils.logging import logger

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "weights_cache"
)

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class DAConfig(NamedTuple):
    patch: int = 14
    width: int = 384
    layers: int = 12
    heads: int = 6
    mlp_ratio: int = 4
    out_layers: tuple = (3, 6, 9, 12)  # 1-indexed encoder depths
    neck_dims: tuple = (48, 96, 192, 384)
    fusion: int = 64
    head_hidden: int = 32
    pos_grid: int = 37  # 518 / 14 positions on each side at train time
    input_size: int = 518


SMALL = DAConfig()


# ---------------------------------------------------------------------------
# DINOv2 encoder
# ---------------------------------------------------------------------------


def _layer_norm(x, p, eps=1e-6):
    mean = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _mha(x, p, heads):
    b, t, d = x.shape
    qkv = x @ p["qkv_w"] + p["qkv_b"]  # (B, T, 3D)
    q, k, v = jnp.split(qkv, 3, -1)

    def hsplit(z):
        return z.reshape(b, t, heads, d // heads).transpose(0, 2, 1, 3)

    q, k, v = hsplit(q), hsplit(k), hsplit(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(d / heads)
    attn = jax.nn.softmax(logits, -1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
    return out @ p["proj_w"] + p["proj_b"]


def _interp_pos_embed(pos, grid_hw, cfg: DAConfig):
    """Bicubic-resize the (1, 1+G*G, D) pos table to the input patch grid."""
    gh, gw = grid_hw
    cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    g = cfg.pos_grid
    patch = patch_pos.reshape(1, g, g, -1)
    patch = jax.image.resize(patch, (1, gh, gw, patch.shape[-1]), "bicubic")
    return jnp.concatenate([cls_pos, patch.reshape(1, gh * gw, -1)], axis=1)


def encode(params, cfg: DAConfig, img: jnp.ndarray) -> List[jnp.ndarray]:
    """img: (B, H, W, 3) ImageNet-normalized, H/W multiples of 14.
    Returns hidden states (incl. CLS) after each selected layer."""
    b, h, w, _ = img.shape
    img = img.astype(params["patch_embed_w"].dtype)
    gh, gw = h // cfg.patch, w // cfg.patch
    x = jax.lax.conv_general_dilated(
        img, params["patch_embed_w"], (cfg.patch, cfg.patch), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_embed_b"]
    x = x.reshape(b, gh * gw, cfg.width)
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + _interp_pos_embed(params["pos_embed"], (gh, gw), cfg)

    states = []
    for blk in params["blocks"]:
        h1 = _mha(_layer_norm(x, blk["ln1"]), blk["attn"], cfg.heads)
        x = x + h1 * blk["ls1"]
        h2 = _layer_norm(x, blk["ln2"])
        h2 = jax.nn.gelu(h2 @ blk["mlp_fc1_w"] + blk["mlp_fc1_b"], approximate=False)
        h2 = h2 @ blk["mlp_fc2_w"] + blk["mlp_fc2_b"]
        x = x + h2 * blk["ls2"]
        states.append(x)
    # One entry per out_layers index (duplicates allowed; XLA dedups).
    # DepthAnything taps intermediate states WITH the shared final
    # layernorm applied (DINOv2 get_intermediate_layers(norm=True); HF
    # Dinov2Backbone apply_layernorm=True) — verified against
    # transformers.DepthAnythingForDepthEstimation in
    # tests/test_torch_parity.py.
    ln = params["backbone_ln"]
    return [_layer_norm(states[i - 1], ln) for i in cfg.out_layers]


# ---------------------------------------------------------------------------
# DPT neck + head
# ---------------------------------------------------------------------------


def _conv(x, w, b=None, stride=1, pad="SAME"):
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return out + b if b is not None else out


def _conv_transpose(x, w, b, stride):
    out = jax.lax.conv_transpose(
        x, w, (stride, stride), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return out + b


def _residual_unit(x, p):
    h = jax.nn.relu(x)
    h = _conv(h, p["conv1_w"], p["conv1_b"])
    h = jax.nn.relu(h)
    h = _conv(h, p["conv2_w"], p["conv2_b"])
    return x + h


@functools.lru_cache(maxsize=64)
def _ac_matrix(n_in: int, n_out: int) -> jnp.ndarray:
    """(n_out, n_in) bilinear interpolation matrix, align_corners=True
    (torch F.interpolate(..., align_corners=True) semantics: src coordinate
    i*(n_in-1)/(n_out-1))."""
    if n_out == 1:
        idx = np.zeros(1)
    else:
        idx = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    lo = np.floor(idx).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (idx - lo).astype(np.float32)
    m = np.zeros((n_out, n_in), np.float32)
    m[np.arange(n_out), lo] += 1.0 - frac
    m[np.arange(n_out), hi] += frac
    return jnp.asarray(m)


def _resize_ac(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """NHWC bilinear resize with align_corners=True (the DPT fusion/head
    interpolations use align_corners=True — jax.image.resize implements
    half-pixel/align_corners=False and does NOT match)."""
    mh = _ac_matrix(x.shape[1], int(out_hw[0]))
    mw = _ac_matrix(x.shape[2], int(out_hw[1]))
    x = jnp.einsum("ph,bhwc->bpwc", mh, x)
    return jnp.einsum("qw,bpwc->bpqc", mw, x)


def depth_head(params, cfg: DAConfig, hidden_states, grid_hw, out_hw):
    gh, gw = grid_hw
    feats = []
    for i, hs in enumerate(hidden_states):
        tokens = hs[:, 1:]  # drop CLS
        f = tokens @ params["reassemble"][i]["proj_w"] + params["reassemble"][i]["proj_b"]
        f = f.reshape(f.shape[0], gh, gw, -1)
        rs = params["reassemble"][i]
        if "up_w" in rs:
            # stage 0 upsamples x4, stage 1 x2 (static per stage index)
            f = _conv_transpose(f, rs["up_w"], rs["up_b"], 4 if i == 0 else 2)
        elif "down_w" in rs:
            f = _conv(f, rs["down_w"], rs["down_b"], stride=2)
        f = _conv(f, params["neck_convs"][i]["w"], None)  # 3x3, no bias (HF)
        feats.append(f)

    # top-down fusion, deepest first (HF DepthAnythingFeatureFusionStage
    # REVERSES the features, so fusion layer 0 pairs with the DEEPEST
    # feature; each layer: x = x + res1(feat); x = res2(x);
    # align_corners=True upsample; 1x1 projection). All verified against
    # transformers.DepthAnythingForDepthEstimation in
    # tests/test_torch_parity.py.
    x = None
    for i in reversed(range(4)):
        p = params["fusion"][3 - i]  # HF layers.0 <-> deepest feature
        if x is None:
            x = _residual_unit(feats[i], p["res2"])
        else:
            x = x + _residual_unit(feats[i], p["res1"])
            x = _residual_unit(x, p["res2"])
        # upsample to the next (shallower) feature's grid — sizes are not
        # exact powers of two when the patch grid is odd (518/14 = 37), so
        # HF passes explicit sizes rather than a x2 factor
        if i > 0:
            target = (feats[i - 1].shape[1], feats[i - 1].shape[2])
        else:
            target = (x.shape[1] * 2, x.shape[2] * 2)
        x = _resize_ac(x, target)
        x = _conv(x, p["proj_w"], p["proj_b"])

    h = _conv(x, params["head"]["conv1_w"], params["head"]["conv1_b"])
    h = _resize_ac(h, out_hw)
    h = jax.nn.relu(_conv(h, params["head"]["conv2_w"], params["head"]["conv2_b"]))
    h = jax.nn.relu(_conv(h, params["head"]["conv3_w"], params["head"]["conv3_b"]))
    return h[..., 0]  # (B, H, W) relative depth


def predict_depth(params, cfg: DAConfig, image: jnp.ndarray) -> jnp.ndarray:
    """image: (B, H, W, 3) in [0, 1] -> (H, W) relative depth (batch 1).

    Resizes to the model's 518-multiple-of-14 input like the HF pipeline,
    then back to the source resolution — all in-graph.
    """
    image = image.astype(jnp.float32)
    b, h, w, _ = image.shape
    mean = jnp.asarray(IMAGENET_MEAN, image.dtype)
    std = jnp.asarray(IMAGENET_STD, image.dtype)
    size = cfg.input_size
    x = jax.image.resize(image, (b, size, size, 3), "bilinear")
    x = (x - mean) / std
    hidden = encode(params, cfg, x)
    g = size // cfg.patch
    depth = depth_head(params, cfg, hidden, (g, g), (size, size))
    depth = jax.image.resize(depth, (b, h, w), "bilinear")
    return depth[0]


# ---------------------------------------------------------------------------
# weights
# ---------------------------------------------------------------------------


def convert_hf_state_dict(sd, cfg: DAConfig = SMALL) -> Dict:
    """HF DepthAnythingForDepthEstimation state dict -> pytree."""

    def arr(k):
        return jnp.asarray(np.asarray(sd[k], dtype=np.float32))

    def lin_w(k):
        return arr(k).T

    blocks = []
    for i in range(cfg.layers):
        p = f"backbone.encoder.layer.{i}"
        q_w, k_w, v_w = (
            lin_w(f"{p}.attention.attention.{n}.weight") for n in ("query", "key", "value")
        )
        q_b, k_b, v_b = (
            arr(f"{p}.attention.attention.{n}.bias") for n in ("query", "key", "value")
        )
        blocks.append(
            {
                "ln1": {"scale": arr(f"{p}.norm1.weight"), "bias": arr(f"{p}.norm1.bias")},
                "ln2": {"scale": arr(f"{p}.norm2.weight"), "bias": arr(f"{p}.norm2.bias")},
                "attn": {
                    "qkv_w": jnp.concatenate([q_w, k_w, v_w], axis=1),
                    "qkv_b": jnp.concatenate([q_b, k_b, v_b]),
                    "proj_w": lin_w(f"{p}.attention.output.dense.weight"),
                    "proj_b": arr(f"{p}.attention.output.dense.bias"),
                },
                "ls1": arr(f"{p}.layer_scale1.lambda1"),
                "ls2": arr(f"{p}.layer_scale2.lambda1"),
                "mlp_fc1_w": lin_w(f"{p}.mlp.fc1.weight"),
                "mlp_fc1_b": arr(f"{p}.mlp.fc1.bias"),
                "mlp_fc2_w": lin_w(f"{p}.mlp.fc2.weight"),
                "mlp_fc2_b": arr(f"{p}.mlp.fc2.bias"),
            }
        )

    reassemble = []
    strides = (4, 2, 1, 2)
    for i in range(4):
        p = f"neck.reassemble_stage.layers.{i}"
        entry = {
            "proj_w": jnp.asarray(
                np.asarray(sd[f"{p}.projection.weight"], np.float32)
            )[..., 0, 0].T
            if np.asarray(sd[f"{p}.projection.weight"]).ndim == 4
            else lin_w(f"{p}.projection.weight"),
            "proj_b": arr(f"{p}.projection.bias"),
        }
        if i < 2:  # transposed conv upsample
            w = np.asarray(sd[f"{p}.resize.weight"], np.float32)  # (in, out, kh, kw)
            entry["up_w"] = jnp.asarray(np.transpose(w, (2, 3, 0, 1)))
            entry["up_b"] = arr(f"{p}.resize.bias")
        elif i == 3:  # stride-2 conv downsample
            w = np.asarray(sd[f"{p}.resize.weight"], np.float32)  # (out, in, kh, kw)
            entry["down_w"] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
            entry["down_b"] = arr(f"{p}.resize.bias")
        reassemble.append(entry)

    def conv_w(k):
        w = np.asarray(sd[k], np.float32)
        return jnp.asarray(np.transpose(w, (2, 3, 1, 0)))

    neck_convs = [{"w": conv_w(f"neck.convs.{i}.weight")} for i in range(4)]

    fusion = []
    for i in range(4):
        p = f"neck.fusion_stage.layers.{i}"
        fusion.append(
            {
                "res1": {
                    "conv1_w": conv_w(f"{p}.residual_layer1.convolution1.weight"),
                    "conv1_b": arr(f"{p}.residual_layer1.convolution1.bias"),
                    "conv2_w": conv_w(f"{p}.residual_layer1.convolution2.weight"),
                    "conv2_b": arr(f"{p}.residual_layer1.convolution2.bias"),
                },
                "res2": {
                    "conv1_w": conv_w(f"{p}.residual_layer2.convolution1.weight"),
                    "conv1_b": arr(f"{p}.residual_layer2.convolution1.bias"),
                    "conv2_w": conv_w(f"{p}.residual_layer2.convolution2.weight"),
                    "conv2_b": arr(f"{p}.residual_layer2.convolution2.bias"),
                },
                "proj_w": conv_w(f"{p}.projection.weight"),
                "proj_b": arr(f"{p}.projection.bias"),
            }
        )

    pe_w = np.asarray(
        sd["backbone.embeddings.patch_embeddings.projection.weight"], np.float32
    )
    return {
        "patch_embed_w": jnp.asarray(np.transpose(pe_w, (2, 3, 1, 0))),
        "patch_embed_b": arr("backbone.embeddings.patch_embeddings.projection.bias"),
        "cls_token": arr("backbone.embeddings.cls_token")[0],
        "pos_embed": arr("backbone.embeddings.position_embeddings"),
        "backbone_ln": {
            "scale": arr("backbone.layernorm.weight"),
            "bias": arr("backbone.layernorm.bias"),
        },
        "blocks": blocks,
        "reassemble": reassemble,
        "neck_convs": neck_convs,
        "fusion": fusion,
        "head": {
            "conv1_w": conv_w("head.conv1.weight"),
            "conv1_b": arr("head.conv1.bias"),
            "conv2_w": conv_w("head.conv2.weight"),
            "conv2_b": arr("head.conv2.bias"),
            "conv3_w": conv_w("head.conv3.weight"),
            "conv3_b": arr("head.conv3.bias"),
        },
    }


def _init_params_impl(key: jax.Array, cfg: DAConfig = SMALL) -> Dict:
    """Seeded random params (structure tests / fallback)."""
    keys = iter(jax.random.split(key, 64 + cfg.layers * 8))

    def nrm(shape, scale=0.02):
        return jax.random.normal(next(keys), shape, jnp.float32) * scale

    d = cfg.width
    blocks = []
    for _ in range(cfg.layers):
        blocks.append(
            {
                "ln1": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
                "ln2": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
                "attn": {
                    "qkv_w": nrm((d, 3 * d)),
                    "qkv_b": jnp.zeros(3 * d),
                    "proj_w": nrm((d, d)),
                    "proj_b": jnp.zeros(d),
                },
                "ls1": jnp.ones(d) * 1e-5,
                "ls2": jnp.ones(d) * 1e-5,
                "mlp_fc1_w": nrm((d, d * cfg.mlp_ratio)),
                "mlp_fc1_b": jnp.zeros(d * cfg.mlp_ratio),
                "mlp_fc2_w": nrm((d * cfg.mlp_ratio, d)),
                "mlp_fc2_b": jnp.zeros(d),
            }
        )
    reassemble = []
    for i, (c, s) in enumerate(zip(cfg.neck_dims, (4, 2, 1, 2))):
        entry = {"proj_w": nrm((d, c)), "proj_b": jnp.zeros(c)}
        if i < 2:
            entry["up_w"] = nrm((s, s, c, c))
            entry["up_b"] = jnp.zeros(c)
        elif i == 3:
            entry["down_w"] = nrm((3, 3, c, c))
            entry["down_b"] = jnp.zeros(c)
        reassemble.append(entry)
    f = cfg.fusion
    fusion = [
        {
            "res1": {
                "conv1_w": nrm((3, 3, f, f)), "conv1_b": jnp.zeros(f),
                "conv2_w": nrm((3, 3, f, f)), "conv2_b": jnp.zeros(f),
            },
            "res2": {
                "conv1_w": nrm((3, 3, f, f)), "conv1_b": jnp.zeros(f),
                "conv2_w": nrm((3, 3, f, f)), "conv2_b": jnp.zeros(f),
            },
            "proj_w": nrm((1, 1, f, f)),
            "proj_b": jnp.zeros(f),
        }
        for _ in range(4)
    ]
    return {
        "patch_embed_w": nrm((cfg.patch, cfg.patch, 3, d)),
        "patch_embed_b": jnp.zeros(d),
        "cls_token": nrm((1, d)),
        "pos_embed": nrm((1, 1 + cfg.pos_grid**2, d)),
        "backbone_ln": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
        "blocks": blocks,
        "reassemble": reassemble,
        "neck_convs": [{"w": nrm((3, 3, c, f))} for c in cfg.neck_dims],
        "fusion": fusion,
        "head": {
            "conv1_w": nrm((3, 3, f, cfg.head_hidden)),
            "conv1_b": jnp.zeros(cfg.head_hidden),
            "conv2_w": nrm((3, 3, cfg.head_hidden, cfg.head_hidden)),
            "conv2_b": jnp.zeros(cfg.head_hidden),
            "conv3_w": nrm((1, 1, cfg.head_hidden, 1)),
            "conv3_b": jnp.zeros(1),
        },
    }


@functools.lru_cache(maxsize=1)
def get_depth_estimator() -> Callable:
    """Resolve a traceable (B,H,W,3)->(H,W) depth callable from weights."""
    path = os.environ.get(
        "TBIST_DEPTH_PTH", os.path.join(_CACHE_DIR, "depth_anything_v2_small.pth")
    )
    if not os.path.exists(path):
        raise FileNotFoundError(f"no Depth-Anything checkpoint at {path}")
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    params = convert_hf_state_dict({k: v.numpy() for k, v in sd.items()})
    logger.info("Depth-Anything: converted checkpoint from %s", path)
    return functools.partial(predict_depth, params, SMALL)


def init_params(*args, **kwargs):
    """Seeded init; always float32 (x64 test mode would otherwise produce
    float64 from jnp.zeros/jax.random defaults)."""
    import jax

    return jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "dtype") and a.dtype.kind == "f"
        else a,
        _init_params_impl(*args, **kwargs),
    )
