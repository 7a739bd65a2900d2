"""Swin-T backbone in pure JAX (GroundingDINO's image encoder).

Reference: the SwinT-OGC config (text/subnetworks/checkpoints/
GroundingDINO_SwinT_OGC.py: backbone "swin_T_224_1k",
return_interm_indices [1, 2, 3]).

Swin-T: patch embed 4×4 → 96ch, depths (2, 2, 6, 2), heads (3, 6, 12, 24),
window 7 with alternating shifted windows, relative-position-bias tables,
patch merging between stages, GELU MLP ×4. Outputs: LayerNormed feature
maps of stages 2, 3, 4 (strides 8, 16, 32).

TPU-first: window partition is reshape/transpose (no gathers); the
shifted-window attention mask is computed at trace time per static shape.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SwinConfig(NamedTuple):
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    mlp_ratio: int = 4
    out_indices: Tuple[int, ...] = (1, 2, 3)


TINY = SwinConfig()


def _layer_norm(x, p, eps=1e-5):
    mean = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _rel_bias_index(window: int) -> np.ndarray:
    """(W², W²) index into the (2W-1)² relative position bias table."""
    coords = np.stack(
        np.meshgrid(np.arange(window), np.arange(window), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return rel[:, :, 0] * (2 * window - 1) + rel[:, :, 1]


def _window_attention(x, p, heads, window, mask=None):
    """x: (nW*B, W², C); mask: (nW, W², W²) additive or None."""
    bn, t, c = x.shape
    qkv = x @ p["qkv_w"] + p["qkv_b"]
    qkv = qkv.reshape(bn, t, 3, heads, c // heads).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    scale = (c // heads) ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
    bias = p["rel_bias_table"][_rel_bias_index(window).reshape(-1)]
    bias = bias.reshape(t, t, heads).transpose(2, 0, 1)
    logits = logits + bias[None]
    if mask is not None:
        nw = mask.shape[0]
        logits = logits.reshape(bn // nw, nw, heads, t, t) + mask[None, :, None]
        logits = logits.reshape(bn, heads, t, t)
    attn = jax.nn.softmax(logits, -1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(bn, t, c)
    return out @ p["proj_w"] + p["proj_b"]


def _shift_mask(hp: int, wp: int, window: int, shift: int) -> jnp.ndarray:
    """Additive attention mask for shifted windows (static shapes)."""
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    for hs in slices:
        for ws in slices:
            img[hs, ws] = cnt
            cnt += 1
    img = img.reshape(hp // window, window, wp // window, window)
    img = img.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = img[:, :, None] - img[:, None, :]
    return jnp.asarray(np.where(diff != 0, -100.0, 0.0).astype(np.float32))


def _block(x, p, hw, heads, window, shift):
    h, w = hw
    b, t, c = x.shape
    shortcut = x
    x = _layer_norm(x, p["ln1"]).reshape(b, h, w, c)

    ph = (window - h % window) % window
    pw = (window - w % window) % window
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw

    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        mask = _shift_mask(hp, wp, window, shift)
    else:
        mask = None

    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, c)
    x = _window_attention(x, p["attn"], heads, window, mask)
    x = x.reshape(b, hp // window, wp // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)

    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    x = x[:, :h, :w].reshape(b, t, c)
    x = shortcut + x

    y = _layer_norm(x, p["ln2"])
    y = jax.nn.gelu(y @ p["mlp_fc1_w"] + p["mlp_fc1_b"], approximate=False)
    y = y @ p["mlp_fc2_w"] + p["mlp_fc2_b"]
    return x + y


def forward(params, cfg: SwinConfig, img: jnp.ndarray) -> List[jnp.ndarray]:
    """img: (B, H, W, 3) normalized, H/W multiples of 32.
    Returns NHWC feature maps for cfg.out_indices (strides 8/16/32 for 1/2/3)."""
    b, H, W, _ = img.shape
    img = img.astype(params["patch_embed_w"].dtype)
    x = jax.lax.conv_general_dilated(
        img, params["patch_embed_w"], (4, 4), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_embed_b"]
    h, w = H // 4, W // 4
    x = _layer_norm(x, params["patch_embed_ln"]).reshape(b, h * w, -1)

    outs = []
    for si, stage in enumerate(params["stages"]):
        heads = cfg.heads[si]
        for bi, blk in enumerate(stage["blocks"]):
            shift = 0 if bi % 2 == 0 else cfg.window // 2
            x = _block(x, blk, (h, w), heads, cfg.window, shift)
        if si in cfg.out_indices:
            ln = params[f"out_ln{si}"]
            outs.append(_layer_norm(x, ln).reshape(b, h, w, -1))
        if "downsample" in stage:  # patch merging
            c = x.shape[-1]
            xg = x.reshape(b, h, w, c)
            # pad odd dims
            xg = jnp.pad(xg, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
            x0 = xg[:, 0::2, 0::2]
            x1 = xg[:, 1::2, 0::2]
            x2 = xg[:, 0::2, 1::2]
            x3 = xg[:, 1::2, 1::2]
            xg = jnp.concatenate([x0, x1, x2, x3], -1)
            h, w = xg.shape[1], xg.shape[2]
            xg = xg.reshape(b, h * w, 4 * c)
            xg = _layer_norm(xg, stage["downsample"]["ln"])
            x = xg @ stage["downsample"]["reduction_w"]
    return outs


def convert_torch_state_dict(sd, prefix: str = "backbone.0.", cfg: SwinConfig = TINY) -> Dict:
    """Official GroundingDINO Swin naming -> pytree."""

    def arr(k):
        return jnp.asarray(np.asarray(sd[prefix + k], dtype=np.float32))

    def lin_w(k):
        return arr(k).T

    stages = []
    for si, depth in enumerate(cfg.depths):
        blocks = []
        for bi in range(depth):
            p = f"layers.{si}.blocks.{bi}"
            blocks.append(
                {
                    "ln1": {"scale": arr(f"{p}.norm1.weight"), "bias": arr(f"{p}.norm1.bias")},
                    "ln2": {"scale": arr(f"{p}.norm2.weight"), "bias": arr(f"{p}.norm2.bias")},
                    "attn": {
                        "qkv_w": lin_w(f"{p}.attn.qkv.weight"),
                        "qkv_b": arr(f"{p}.attn.qkv.bias"),
                        "proj_w": lin_w(f"{p}.attn.proj.weight"),
                        "proj_b": arr(f"{p}.attn.proj.bias"),
                        "rel_bias_table": arr(f"{p}.attn.relative_position_bias_table"),
                    },
                    "mlp_fc1_w": lin_w(f"{p}.mlp.fc1.weight"),
                    "mlp_fc1_b": arr(f"{p}.mlp.fc1.bias"),
                    "mlp_fc2_w": lin_w(f"{p}.mlp.fc2.weight"),
                    "mlp_fc2_b": arr(f"{p}.mlp.fc2.bias"),
                }
            )
        stage = {"blocks": blocks}
        if si < len(cfg.depths) - 1:
            stage["downsample"] = {
                "ln": {
                    "scale": arr(f"layers.{si}.downsample.norm.weight"),
                    "bias": arr(f"layers.{si}.downsample.norm.bias"),
                },
                "reduction_w": lin_w(f"layers.{si}.downsample.reduction.weight"),
            }
        stages.append(stage)

    params = {
        "patch_embed_w": jnp.asarray(
            np.transpose(np.asarray(sd[prefix + "patch_embed.proj.weight"], np.float32), (2, 3, 1, 0))
        ),
        "patch_embed_b": arr("patch_embed.proj.bias"),
        "patch_embed_ln": {
            "scale": arr("patch_embed.norm.weight"),
            "bias": arr("patch_embed.norm.bias"),
        },
        "stages": stages,
    }
    for i in cfg.out_indices:
        params[f"out_ln{i}"] = {
            "scale": arr(f"norm{i}.weight"),
            "bias": arr(f"norm{i}.bias"),
        }
    return params


def init_params(key: jax.Array, cfg: SwinConfig = TINY) -> Dict:
    keys = iter(jax.random.split(key, 512))

    def nrm(shape, scale=0.02):
        return jax.random.normal(next(keys), shape, jnp.float32) * scale

    def ln(dim):
        return {"scale": jnp.ones(dim, jnp.float32), "bias": jnp.zeros(dim, jnp.float32)}

    stages = []
    dim = cfg.embed_dim
    for si, depth in enumerate(cfg.depths):
        blocks = []
        for _ in range(depth):
            blocks.append(
                {
                    "ln1": ln(dim), "ln2": ln(dim),
                    "attn": {
                        "qkv_w": nrm((dim, 3 * dim)), "qkv_b": jnp.zeros(3 * dim, jnp.float32),
                        "proj_w": nrm((dim, dim)), "proj_b": jnp.zeros(dim, jnp.float32),
                        "rel_bias_table": nrm(((2 * cfg.window - 1) ** 2, cfg.heads[si])),
                    },
                    "mlp_fc1_w": nrm((dim, cfg.mlp_ratio * dim)),
                    "mlp_fc1_b": jnp.zeros(cfg.mlp_ratio * dim, jnp.float32),
                    "mlp_fc2_w": nrm((cfg.mlp_ratio * dim, dim)),
                    "mlp_fc2_b": jnp.zeros(dim, jnp.float32),
                }
            )
        stage = {"blocks": blocks}
        if si < len(cfg.depths) - 1:
            stage["downsample"] = {
                "ln": ln(4 * dim),
                "reduction_w": nrm((4 * dim, 2 * dim)),
            }
        stages.append(stage)
        if si < len(cfg.depths) - 1:
            dim *= 2

    params = {
        "patch_embed_w": nrm((4, 4, 3, cfg.embed_dim)),
        "patch_embed_b": jnp.zeros(cfg.embed_dim, jnp.float32),
        "patch_embed_ln": ln(cfg.embed_dim),
        "stages": stages,
    }
    dims = [cfg.embed_dim * (2**i) for i in range(len(cfg.depths))]
    for i in cfg.out_indices:
        params[f"out_ln{i}"] = ln(dims[i])
    return params
