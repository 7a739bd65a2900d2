"""Segment Anything (ViT-B) in pure JAX — promptable box segmentation.

Reference usage: text/subnetworks/segment_anything_object_segmenter.py —
``SamPredictor.set_image`` + ``predict_torch(boxes=..., multimask_output=
False)`` over GroundingDINO boxes, producing N×1×H×W masks that the
TextMaskExtractor ORs into one (H, W) bool mask.

Architecture (sam_vit_b):
* image encoder ViT-B/16: 1024×1024 input → 64×64 grid, width 768,
  12 layers, 12 heads, decomposed relative position attention, 14×14
  window attention except global layers {2, 5, 8, 11} (0-indexed),
  neck: 1×1 conv → LN2d → 3×3 conv → LN2d to 256 channels.
* prompt encoder: random-Fourier positional encoding; boxes become two
  corner points with learned type embeddings (indices 2, 3).
* mask decoder: two-way transformer (2 layers, 8 heads, downsample 128),
  IoU token + 4 mask tokens, 2× transposed-conv upscaling, per-token
  hypernetwork MLPs; single-mask output uses mask token 0.

TPU-first notes: everything is NHWC, batched over boxes in one decoder
call, static 1024² input (one compile), no windows-as-python-loops —
window partition is reshape/transpose.
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tbist_tpu.utils.logging import logger

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "weights_cache"
)


class SamConfig(NamedTuple):
    img_size: int = 1024
    patch: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    window: int = 14
    global_layers: tuple = (2, 5, 8, 11)
    embed_dim: int = 256  # neck / decoder dim
    decoder_heads: int = 8
    decoder_layers: int = 2
    mlp_dim: int = 2048
    num_mask_tokens: int = 4


BASE = SamConfig()

PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


# ---------------------------------------------------------------------------
# image encoder
# ---------------------------------------------------------------------------


def _layer_norm(x, p, eps=1e-6):
    mean = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Decomposed rel-pos lookup (SAM semantics; assumes q_size == k_size)."""
    max_rel = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel:
        r = jax.image.resize(rel_pos, (max_rel, rel_pos.shape[1]), "bilinear")
    else:
        r = rel_pos
    q = jnp.arange(q_size)[:, None]
    k = jnp.arange(k_size)[None, :]
    idx = q - k + (k_size - 1)
    return r[idx]  # (q, k, dim)


def _use_pallas_attn(t: int) -> bool:
    """Route big global-attention grids through the Pallas kernel.

    TBIST_PALLAS_SAM_ATTN=0 forces the einsum path, =1 forces the kernel;
    default is the kernel for full-grid attention (T >= 4096) on TPU
    backends — measured 3x on the 1024² encoder (benchmarks/PROFILE.md)."""
    env = os.environ.get("TBIST_PALLAS_SAM_ATTN", "")
    if env == "0":
        return False
    if env:
        return True
    return t >= 4096 and jax.default_backend() not in ("cpu",)


def _attn_rel(x, p, heads, hw: Tuple[int, int]):
    """Windowed/global attention with decomposed relative positions.
    x: (B, H, W, C) where (H, W) is the window or full grid."""
    b, h, w, c = x.shape
    t = h * w
    qkv = x.reshape(b, t, c) @ p["qkv_w"] + p["qkv_b"]
    qkv = qkv.reshape(b, t, 3, heads, c // heads).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # (B, heads, T, d)
    scale = (c // heads) ** -0.5

    rh = _get_rel_pos(h, h, p["rel_pos_h"])  # (h, h, d)
    rw = _get_rel_pos(w, w, p["rel_pos_w"])
    qr = q.reshape(b, heads, h, w, -1)
    bias_h = jnp.einsum("bnhwd,hkd->bnhwk", qr, rh)  # (B,heads,h,w,h)
    bias_w = jnp.einsum("bnhwd,wkd->bnhwk", qr, rw)  # (B,heads,h,w,w)

    if _use_pallas_attn(t):
        from tbist_tpu.ops import pallas_sam_attn

        n = b * heads
        d = c // heads
        out = pallas_sam_attn.attention_with_rel_bias(
            (q * scale).reshape(n, t, d), k.reshape(n, t, d),
            v.reshape(n, t, d), bias_h.reshape(n, t, h),
            bias_w.reshape(n, t, w), h, w,
        ).reshape(b, heads, t, d)
    else:
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
        bias = bias_h[..., :, None] + bias_w[..., None, :]  # (B,heads,h,w,h,w)
        logits = logits + bias.reshape(b, heads, t, t)
        attn = jax.nn.softmax(logits, -1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)

    out = out.transpose(0, 2, 1, 3).reshape(b, t, c)
    return (out @ p["proj_w"] + p["proj_b"]).reshape(b, h, w, c)


def _window_partition(x, win):
    b, h, w, c = x.shape
    ph = (win - h % win) % win
    pw = (win - w % win) % win
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // win, win, wp // win, win, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win, win, c)
    return x, (hp, wp)


def _window_unpartition(wins, win, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = wins.shape[0] // ((hp // win) * (wp // win))
    x = wins.reshape(b, hp // win, wp // win, win, win, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def encode_image(params, cfg: SamConfig, img: jnp.ndarray) -> jnp.ndarray:
    """img: (1, 1024, 1024, 3) pixel-normalized. -> (1, 64, 64, 256)."""
    x = jax.lax.conv_general_dilated(
        img, params["patch_embed_w"], (cfg.patch, cfg.patch), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_embed_b"]
    x = x + params["pos_embed"]
    g = cfg.img_size // cfg.patch

    for i, blk in enumerate(params["blocks"]):
        shortcut = x
        xn = _layer_norm(x, blk["ln1"])
        if i in cfg.global_layers:
            xn = _attn_rel(xn, blk["attn"], cfg.heads, (g, g))
        else:
            wins, pad_hw = _window_partition(xn, cfg.window)
            wins = _attn_rel(wins, blk["attn"], cfg.heads, (cfg.window, cfg.window))
            xn = _window_unpartition(wins, cfg.window, pad_hw, (g, g))
        x = shortcut + xn
        h = _layer_norm(x, blk["ln2"])
        h = jax.nn.gelu(h @ blk["mlp_fc1_w"] + blk["mlp_fc1_b"], approximate=False)
        x = x + (h @ blk["mlp_fc2_w"] + blk["mlp_fc2_b"])

    # neck: conv1x1 -> LN2d -> conv3x3 -> LN2d
    x = jax.lax.conv_general_dilated(
        x, params["neck_conv1_w"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = _layer_norm(x, params["neck_ln1"])
    x = jax.lax.conv_general_dilated(
        x, params["neck_conv2_w"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = _layer_norm(x, params["neck_ln2"])
    return x


# ---------------------------------------------------------------------------
# prompt encoder + mask decoder
# ---------------------------------------------------------------------------


def _pe_encode(coords: jnp.ndarray, gaussian: jnp.ndarray) -> jnp.ndarray:
    """Random-Fourier positional encoding of [0,1] coords (..., 2)."""
    c = 2.0 * coords - 1.0
    proj = (2.0 * np.pi) * (c @ gaussian)  # (..., 128)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], -1)  # (..., 256)


def _grid_pe(gaussian: jnp.ndarray, size: int) -> jnp.ndarray:
    ys = (jnp.arange(size) + 0.5) / size
    xs = (jnp.arange(size) + 0.5) / size
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1)  # (H, W, 2) x,y
    return _pe_encode(grid, gaussian)


def _mha_split(q, k, v, p, heads):
    def proj(x, name):
        return x @ p[f"{name}_w"] + p[f"{name}_b"]

    q, k, v = proj(q, "q"), proj(k, "k"), proj(v, "v")
    b, tq, d = q.shape
    tk = k.shape[1]

    def split(x, t):
        return x.reshape(b, t, heads, -1).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q, tq), split(k, tk), split(v, tk)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(qh.shape[-1])
    attn = jax.nn.softmax(logits, -1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
    out = out.transpose(0, 2, 1, 3).reshape(b, tq, -1)
    return out @ p["out_w"] + p["out_b"]


def _twoway_block(queries, keys, q_pe, k_pe, p, heads, skip_first_pe: bool):
    # self attention on tokens
    q = queries if skip_first_pe else queries + q_pe
    queries = queries + _mha_split(q, q, queries, p["self_attn"], heads)
    queries = _layer_norm(queries, p["ln1"])
    # token -> image cross attention (downsampled inside weights)
    q = queries + q_pe
    k = keys + k_pe
    queries = queries + _mha_split(q, k, keys, p["cross_t2i"], heads)
    queries = _layer_norm(queries, p["ln2"])
    # mlp
    h = jax.nn.relu(queries @ p["mlp_fc1_w"] + p["mlp_fc1_b"])
    queries = queries + (h @ p["mlp_fc2_w"] + p["mlp_fc2_b"])
    queries = _layer_norm(queries, p["ln3"])
    # image -> token cross attention
    q = queries + q_pe
    keys = keys + _mha_split(k, q, queries, p["cross_i2t"], heads)
    keys = _layer_norm(keys, p["ln4"])
    return queries, keys


def _mlp_stack(x, layers, relu_last=False, sigmoid_last=False):
    n = len(layers)
    for i, p in enumerate(layers):
        x = x @ p["w"] + p["b"]
        if i < n - 1:
            x = jax.nn.relu(x)
    if relu_last:
        x = jax.nn.relu(x)
    if sigmoid_last:
        x = jax.nn.sigmoid(x)
    return x


def decode_masks(
    params, cfg: SamConfig, image_embedding: jnp.ndarray, boxes01: jnp.ndarray
) -> jnp.ndarray:
    """image_embedding: (1, 64, 64, 256); boxes01: (N, 4) xyxy in [0, 1].
    Returns (N, 256, 256) single-mask logits (multimask_output=False)."""
    boxes01 = boxes01.astype(jnp.float32)
    image_embedding = image_embedding.astype(jnp.float32)
    n = boxes01.shape[0]
    gaussian = params["pe_gaussian"]  # (2, 128)

    # --- prompt encoding: box corners as 2 points ---
    corners = boxes01.reshape(n, 2, 2)  # (N, 2, [x, y])
    corner_pe = _pe_encode(corners, gaussian)
    corner_pe = corner_pe + jnp.stack(
        [params["point_embed"][2], params["point_embed"][3]]
    )
    sparse = corner_pe  # (N, 2, 256)
    dense = params["no_mask_embed"][None, None, None, :]  # broadcast (1,1,1,256)

    # --- tokens ---
    output_tokens = jnp.concatenate(
        [params["iou_token"][None], params["mask_tokens"]], axis=0
    )  # (1+4, 256)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(output_tokens[None], (n, *output_tokens.shape)), sparse],
        axis=1,
    )  # (N, 7, 256)

    g = image_embedding.shape[1]
    src = image_embedding + dense  # (1, 64, 64, 256)
    src = jnp.broadcast_to(src, (n, g, g, cfg.embed_dim)).reshape(n, g * g, -1)
    pos = _grid_pe(gaussian, g).reshape(1, g * g, -1)
    pos = jnp.broadcast_to(pos, (n, g * g, pos.shape[-1]))

    queries, keys = tokens, src
    for i, blk in enumerate(params["decoder_blocks"]):
        queries, keys = _twoway_block(
            queries, keys, tokens, pos, blk, cfg.decoder_heads, skip_first_pe=(i == 0)
        )
    # final token -> image attention
    q = queries + tokens
    k = keys + pos
    queries = queries + _mha_split(q, k, keys, params["final_t2i"], cfg.decoder_heads)
    queries = _layer_norm(queries, params["final_ln"])

    mask_tokens_out = queries[:, 1 : 1 + cfg.num_mask_tokens]

    # upscale image features 4x: convT stride2 -> LN2d -> gelu -> convT stride2 -> gelu
    feat = keys.reshape(n, g, g, cfg.embed_dim)
    feat = jax.lax.conv_transpose(
        feat, params["upscale_conv1_w"], (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["upscale_conv1_b"]
    feat = _layer_norm(feat, params["upscale_ln"])
    feat = jax.nn.gelu(feat, approximate=False)
    feat = jax.lax.conv_transpose(
        feat, params["upscale_conv2_w"], (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["upscale_conv2_b"]
    feat = jax.nn.gelu(feat, approximate=False)  # (N, 256, 256, 32)

    # single-mask output: token 0 hypernetwork
    hyper = _mlp_stack(mask_tokens_out[:, 0], params["hyper_mlps"][0])  # (N, 32)
    masks = jnp.einsum("nhwc,nc->nhw", feat, hyper)
    return masks  # logits at 256x256


# ---------------------------------------------------------------------------
# end-to-end predictor
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",))
def _encode_jit(params, cfg: SamConfig, img):
    return encode_image(params, cfg, img)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _decode_jit(params, cfg: SamConfig, emb, boxes01):
    return decode_masks(params, cfg, emb, boxes01)


_SIZE_ADAPTED_CACHE: dict = {}  # (id(params), img_size) -> (params2, cfg2, ref)


def params_for_size(params, cfg: SamConfig, img_size: int) -> Tuple:
    """Adapt (params, cfg) to a non-default encoder input size.

    SAM's checkpoint pins the encoder to cfg.img_size (1024) through its
    learned position grid and the GLOBAL layers' relative-position tables.
    For a smaller grid g' this bilinearly resizes ``pos_embed`` to
    (1, g', g', C) and linearly resizes each global layer's rel_pos_h/w
    to 2*g'-1 rows — the same interpolation the official SAM applies for
    off-size inputs (segment_anything ViTDet ``get_rel_pos``). Window
    layers keep their (2*window-1) tables; the decoder reads the grid
    from the embedding shape, so it adapts for free.

    Results are cached per (params identity, size); the cache holds a
    strong ref to the source tree so ids cannot be recycled. The default
    size returns the inputs untouched — the reference-faithful path."""
    if img_size == cfg.img_size:
        return params, cfg
    if img_size % cfg.patch:
        raise ValueError(f"encoder size {img_size} not a multiple of patch "
                         f"{cfg.patch}")
    key = (id(params), img_size)
    hit = _SIZE_ADAPTED_CACHE.get(key)
    if hit is not None and hit[2] is params:
        return hit[0], hit[1]
    cfg2 = cfg._replace(img_size=img_size)
    g_new = img_size // cfg.patch
    p2 = dict(params)
    pe = params["pos_embed"]
    p2["pos_embed"] = jax.image.resize(
        pe, (1, g_new, g_new, pe.shape[-1]), "bilinear"
    )
    blocks = []
    for i, blk in enumerate(params["blocks"]):
        if i in cfg.global_layers:
            attn = dict(blk["attn"])
            for kname in ("rel_pos_h", "rel_pos_w"):
                r = attn[kname]  # (2*g_old-1, head_dim)
                attn[kname] = jax.image.resize(
                    r, (2 * g_new - 1, r.shape[-1]), "linear"
                )
            blk = {**blk, "attn": attn}
        blocks.append(blk)
    p2["blocks"] = blocks
    if len(_SIZE_ADAPTED_CACHE) > 8:
        _SIZE_ADAPTED_CACHE.clear()
    _SIZE_ADAPTED_CACHE[key] = (p2, cfg2, params)
    return p2, cfg2


def encode_uint8(params, cfg: SamConfig, image) -> Tuple:
    """Preprocess + dispatch the image encoder; return (emb, scale, nh, nw).

    ``image`` is (H, W, 3) uint8 — host numpy OR an already-on-device
    array (the DINO+SAM chain uploads the frame ONCE and shares it; a
    512px uint8 upload through the ~31 MB/s axon tunnel costs ~25 ms).
    Returns without blocking: ``emb`` is an async device value, so the
    caller can queue this encoder behind an in-flight DINO forward and
    only block later (SamPredictor.set_image has no such overlap — it is
    torch-eager; reference TextMaskExtractor.py:25-68 runs the stages
    strictly serially).
    """
    h, w = image.shape[:2]
    scale = cfg.img_size / max(h, w)
    nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)

    if isinstance(image, jnp.ndarray):
        x = image[None].astype(jnp.float32)
    else:
        # upload uint8 and cast on device: f32 would cost 4x the bytes
        x = jnp.asarray(np.ascontiguousarray(image))[None].astype(jnp.float32)
    x = jax.image.resize(x, (1, nh, nw, 3), "bilinear")
    x = (x - PIXEL_MEAN) / PIXEL_STD
    x = jnp.pad(x, ((0, 0), (0, cfg.img_size - nh), (0, cfg.img_size - nw), (0, 0)))
    return _encode_jit(params, cfg, x), scale, nh, nw


def encode_uint8_batch(params, cfg: SamConfig, frames) -> Tuple:
    """Batched ``encode_uint8``: (B, H, W, 3) uint8 (host or device) ->
    (embs (B, 64, 64, 256) async, scale, nh, nw).

    ONE image-encoder program for a whole frame chunk — the masked-text
    video lane's segmentation stage (the reference runs
    SamPredictor.set_image per frame, text/TextMaskExtractor.py:45-50).
    Per-frame outputs are bit-identical to the single-image program.
    """
    h, w = frames.shape[1:3]
    scale = cfg.img_size / max(h, w)
    nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
    if not isinstance(frames, jnp.ndarray):
        frames = jnp.asarray(np.ascontiguousarray(frames))
    x = frames.astype(jnp.float32)
    x = jax.image.resize(x, (x.shape[0], nh, nw, 3), "bilinear")
    x = (x - PIXEL_MEAN) / PIXEL_STD
    x = jnp.pad(x, ((0, 0), (0, cfg.img_size - nh), (0, cfg.img_size - nw), (0, 0)))
    return _encode_jit(params, cfg, x), scale, nh, nw


@functools.partial(jax.jit, static_argnames=("cfg", "nh", "nw", "h", "w"))
def _masks_batch_jit(params, cfg: SamConfig, embs, boxes01, valid, nh, nw, h, w):
    # (B, K, 256, 256) mask logits: the prompt decoder vmapped per frame
    logits = jax.vmap(lambda e, bx: decode_masks(params, cfg, e[None], bx))(
        embs, boxes01
    )
    b, k = logits.shape[:2]
    flat = logits.reshape(b * k, *logits.shape[2:])
    up = jax.image.resize(flat, (b * k, cfg.img_size, cfg.img_size), "bilinear")
    up = up[:, :nh, :nw]
    full = jax.image.resize(up, (b * k, h, w), "bilinear")
    m = (full > 0.0).reshape(b, k, h, w) & valid[:, :, None, None]
    return jnp.any(m, axis=1)


def masks_from_embedding_batch(
    params, cfg: SamConfig, embs, scale, nh, nw, h, w, boxes_xyxy, valid
) -> jnp.ndarray:
    """Batched ``masks_from_embedding``: (B, K, 4) pixel-xyxy boxes (padded
    per frame; ``valid`` (B, K) marks the real ones) against (B, ...)
    embeddings -> DEVICE (B, H, W) bool (not fetched — the video lane
    composites on device). Per frame this matches masks_from_embedding's
    sum(0) > 0 union; padded boxes are masked out, and a frame with zero
    valid boxes yields all-False (TextMaskExtractor.py:52-53 semantics)."""
    boxes = np.asarray(boxes_xyxy, np.float32) * scale
    boxes01 = jnp.asarray((boxes + 0.5) / cfg.img_size)
    return _masks_batch_jit(
        params, cfg, embs, boxes01, jnp.asarray(valid), nh, nw, h, w
    )


def masks_from_embedding(
    params, cfg: SamConfig, emb, scale, nh, nw, h, w, boxes_xyxy
) -> np.ndarray:
    """Decode pixel-xyxy boxes against a precomputed embedding -> (N, H, W) bool."""
    boxes = np.asarray(boxes_xyxy, np.float32) * scale
    # +0.5 shifts coords to pixel centers before normalizing against the
    # PADDED square (SamPromptEncoder._embed_boxes: `boxes = boxes + 0.5`)
    boxes01 = (boxes + 0.5) / cfg.img_size
    logits = _decode_jit(params, cfg, emb, jnp.asarray(boxes01))  # (N, 256, 256)

    # upscale to padded 1024, crop the un-padded region, resize to original
    n = logits.shape[0]
    up = jax.image.resize(logits, (n, cfg.img_size, cfg.img_size), "bilinear")
    up = up[:, :nh, :nw]
    full = jax.image.resize(up, (n, h, w), "bilinear")
    return np.asarray(full > 0.0)


def predict_boxes(
    params, cfg: SamConfig, image: np.ndarray, boxes_xyxy: np.ndarray
) -> np.ndarray:
    """image: (H, W, 3) uint8 RGB; boxes in pixel xyxy. -> (N, H, W) bool.

    Host-side pre/post (resize bookkeeping) mirrors SamPredictor: longest
    side to 1024, zero-pad to square, mask logits > 0.
    """
    h, w = image.shape[:2]
    emb, scale, nh, nw = encode_uint8(params, cfg, image)
    return masks_from_embedding(params, cfg, emb, scale, nh, nw, h, w, boxes_xyxy)


# ---------------------------------------------------------------------------
# weight conversion (facebookresearch SAM checkpoint)
# ---------------------------------------------------------------------------


def convert_sam_state_dict(sd, cfg: SamConfig = BASE) -> Dict:
    def arr(k):
        return jnp.asarray(np.asarray(sd[k], dtype=np.float32))

    def lin_w(k):
        return arr(k).T

    def conv_w(k):
        return jnp.asarray(
            np.transpose(np.asarray(sd[k], np.float32), (2, 3, 1, 0))
        )

    def convT_w(k):  # torch convT (in, out, kh, kw) -> HWIO
        return jnp.asarray(
            np.transpose(np.asarray(sd[k], np.float32), (2, 3, 0, 1))
        )

    blocks = []
    for i in range(cfg.layers):
        p = f"image_encoder.blocks.{i}"
        blocks.append(
            {
                "ln1": {"scale": arr(f"{p}.norm1.weight"), "bias": arr(f"{p}.norm1.bias")},
                "ln2": {"scale": arr(f"{p}.norm2.weight"), "bias": arr(f"{p}.norm2.bias")},
                "attn": {
                    "qkv_w": lin_w(f"{p}.attn.qkv.weight"),
                    "qkv_b": arr(f"{p}.attn.qkv.bias"),
                    "proj_w": lin_w(f"{p}.attn.proj.weight"),
                    "proj_b": arr(f"{p}.attn.proj.bias"),
                    "rel_pos_h": arr(f"{p}.attn.rel_pos_h"),
                    "rel_pos_w": arr(f"{p}.attn.rel_pos_w"),
                },
                "mlp_fc1_w": lin_w(f"{p}.mlp.lin1.weight"),
                "mlp_fc1_b": arr(f"{p}.mlp.lin1.bias"),
                "mlp_fc2_w": lin_w(f"{p}.mlp.lin2.weight"),
                "mlp_fc2_b": arr(f"{p}.mlp.lin2.bias"),
            }
        )

    def attn_block(prefix):
        return {
            "q_w": lin_w(f"{prefix}.q_proj.weight"), "q_b": arr(f"{prefix}.q_proj.bias"),
            "k_w": lin_w(f"{prefix}.k_proj.weight"), "k_b": arr(f"{prefix}.k_proj.bias"),
            "v_w": lin_w(f"{prefix}.v_proj.weight"), "v_b": arr(f"{prefix}.v_proj.bias"),
            "out_w": lin_w(f"{prefix}.out_proj.weight"), "out_b": arr(f"{prefix}.out_proj.bias"),
        }

    dec_blocks = []
    for i in range(cfg.decoder_layers):
        p = f"mask_decoder.transformer.layers.{i}"
        dec_blocks.append(
            {
                "self_attn": attn_block(f"{p}.self_attn"),
                "cross_t2i": attn_block(f"{p}.cross_attn_token_to_image"),
                "cross_i2t": attn_block(f"{p}.cross_attn_image_to_token"),
                "ln1": {"scale": arr(f"{p}.norm1.weight"), "bias": arr(f"{p}.norm1.bias")},
                "ln2": {"scale": arr(f"{p}.norm2.weight"), "bias": arr(f"{p}.norm2.bias")},
                "ln3": {"scale": arr(f"{p}.norm3.weight"), "bias": arr(f"{p}.norm3.bias")},
                "ln4": {"scale": arr(f"{p}.norm4.weight"), "bias": arr(f"{p}.norm4.bias")},
                "mlp_fc1_w": lin_w(f"{p}.mlp.lin1.weight"),
                "mlp_fc1_b": arr(f"{p}.mlp.lin1.bias"),
                "mlp_fc2_w": lin_w(f"{p}.mlp.lin2.weight"),
                "mlp_fc2_b": arr(f"{p}.mlp.lin2.bias"),
            }
        )

    hyper_mlps = []
    for t in range(cfg.num_mask_tokens):
        layers = []
        for li in range(3):
            p = f"mask_decoder.output_hypernetworks_mlps.{t}.layers.{li}"
            layers.append({"w": lin_w(f"{p}.weight"), "b": arr(f"{p}.bias")})
        hyper_mlps.append(layers)

    return {
        "patch_embed_w": conv_w("image_encoder.patch_embed.proj.weight"),
        "patch_embed_b": arr("image_encoder.patch_embed.proj.bias"),
        "pos_embed": arr("image_encoder.pos_embed"),
        "blocks": blocks,
        "neck_conv1_w": conv_w("image_encoder.neck.0.weight"),
        "neck_ln1": {"scale": arr("image_encoder.neck.1.weight"), "bias": arr("image_encoder.neck.1.bias")},
        "neck_conv2_w": conv_w("image_encoder.neck.2.weight"),
        "neck_ln2": {"scale": arr("image_encoder.neck.3.weight"), "bias": arr("image_encoder.neck.3.bias")},
        "pe_gaussian": arr("prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"),
        "point_embed": jnp.stack(
            [arr(f"prompt_encoder.point_embeddings.{i}.weight")[0] for i in range(4)]
        ),
        "no_mask_embed": arr("prompt_encoder.no_mask_embed.weight")[0],
        "iou_token": arr("mask_decoder.iou_token.weight")[0],
        "mask_tokens": arr("mask_decoder.mask_tokens.weight"),
        "decoder_blocks": dec_blocks,
        "final_t2i": attn_block("mask_decoder.transformer.final_attn_token_to_image"),
        "final_ln": {
            "scale": arr("mask_decoder.transformer.norm_final_attn.weight"),
            "bias": arr("mask_decoder.transformer.norm_final_attn.bias"),
        },
        "upscale_conv1_w": convT_w("mask_decoder.output_upscaling.0.weight"),
        "upscale_conv1_b": arr("mask_decoder.output_upscaling.0.bias"),
        "upscale_ln": {
            "scale": arr("mask_decoder.output_upscaling.1.weight"),
            "bias": arr("mask_decoder.output_upscaling.1.bias"),
        },
        "upscale_conv2_w": convT_w("mask_decoder.output_upscaling.3.weight"),
        "upscale_conv2_b": arr("mask_decoder.output_upscaling.3.bias"),
        "hyper_mlps": hyper_mlps,
    }


def _init_params_impl(key: jax.Array, cfg: SamConfig = BASE) -> Dict:
    """Seeded random params at the given config (structure tests)."""
    keys = iter(jax.random.split(key, 256))

    def nrm(shape, scale=0.02):
        return jax.random.normal(next(keys), shape, jnp.float32) * scale

    d, e = cfg.width, cfg.embed_dim
    g = cfg.img_size // cfg.patch

    def ln(dim):
        return {"scale": jnp.ones(dim), "bias": jnp.zeros(dim)}

    def attn_block(dq, dk=None, inner=None):
        dk = dk or dq
        inner = inner or dq
        return {
            "q_w": nrm((dq, inner)), "q_b": jnp.zeros(inner),
            "k_w": nrm((dk, inner)), "k_b": jnp.zeros(inner),
            "v_w": nrm((dk, inner)), "v_b": jnp.zeros(inner),
            "out_w": nrm((inner, dq)), "out_b": jnp.zeros(dq),
        }

    blocks = []
    for _ in range(cfg.layers):
        blocks.append(
            {
                "ln1": ln(d), "ln2": ln(d),
                "attn": {
                    "qkv_w": nrm((d, 3 * d)), "qkv_b": jnp.zeros(3 * d),
                    "proj_w": nrm((d, d)), "proj_b": jnp.zeros(d),
                    "rel_pos_h": nrm((2 * cfg.window - 1, d // cfg.heads)),
                    "rel_pos_w": nrm((2 * cfg.window - 1, d // cfg.heads)),
                },
                "mlp_fc1_w": nrm((d, 4 * d)), "mlp_fc1_b": jnp.zeros(4 * d),
                "mlp_fc2_w": nrm((4 * d, d)), "mlp_fc2_b": jnp.zeros(d),
            }
        )
    dec_blocks = []
    for _ in range(cfg.decoder_layers):
        dec_blocks.append(
            {
                "self_attn": attn_block(e),
                "cross_t2i": attn_block(e, e, e // 2),
                "cross_i2t": attn_block(e, e, e // 2),
                "ln1": ln(e), "ln2": ln(e), "ln3": ln(e), "ln4": ln(e),
                "mlp_fc1_w": nrm((e, cfg.mlp_dim)), "mlp_fc1_b": jnp.zeros(cfg.mlp_dim),
                "mlp_fc2_w": nrm((cfg.mlp_dim, e)), "mlp_fc2_b": jnp.zeros(e),
            }
        )
    hyper = [
        [
            {"w": nrm((e, e)), "b": jnp.zeros(e)},
            {"w": nrm((e, e)), "b": jnp.zeros(e)},
            {"w": nrm((e, e // 8)), "b": jnp.zeros(e // 8)},
        ]
        for _ in range(cfg.num_mask_tokens)
    ]
    return {
        "patch_embed_w": nrm((cfg.patch, cfg.patch, 3, d)),
        "patch_embed_b": jnp.zeros(d),
        "pos_embed": nrm((1, g, g, d)),
        "blocks": blocks,
        "neck_conv1_w": nrm((1, 1, d, e)),
        "neck_ln1": ln(e),
        "neck_conv2_w": nrm((3, 3, e, e)),
        "neck_ln2": ln(e),
        "pe_gaussian": jax.random.normal(next(keys), (2, e // 2)),
        "point_embed": nrm((4, e)),
        "no_mask_embed": nrm((e,)),
        "iou_token": nrm((e,)),
        "mask_tokens": nrm((cfg.num_mask_tokens, e)),
        "decoder_blocks": dec_blocks,
        "final_t2i": attn_block(e, e, e // 2),
        "final_ln": ln(e),
        "upscale_conv1_w": nrm((2, 2, e, e // 4)),
        "upscale_conv1_b": jnp.zeros(e // 4),
        "upscale_ln": ln(e // 4),
        "upscale_conv2_w": nrm((2, 2, e // 4, e // 8)),
        "upscale_conv2_b": jnp.zeros(e // 8),
        "hyper_mlps": hyper,
    }


@functools.lru_cache(maxsize=1)
def get_loaded_params():
    """Converted checkpoint params (cached); raises if the .pth is absent."""
    path = os.environ.get(
        "TBIST_SAM_PTH", os.path.join(_CACHE_DIR, "sam_vit_b_01ec64.pth")
    )
    if not os.path.exists(path):
        raise FileNotFoundError(f"no SAM checkpoint at {path}")
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    params = convert_sam_state_dict({k: v.numpy() for k, v in sd.items()})
    logger.info("SAM ViT-B: converted checkpoint from %s", path)
    return params


@functools.lru_cache(maxsize=1)
def get_predictor() -> Callable:
    return functools.partial(predict_boxes, get_loaded_params(), BASE)


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
