"""GroundingDINO (SwinT-OGC) in pure JAX — open-vocabulary detection.

Reference: text/subnetworks/groundingdino_text_object_detector.py drives
the official ``groundingdino-py`` model built from the SwinT_OGC config
(checkpoints/GroundingDINO_SwinT_OGC.py): 6 encoder / 6 decoder layers,
hidden 256, 8 heads, 4 feature levels, 4 deformable points, 900 queries,
BERT-base text encoder, text-cross-attention + fusion enabled.

Structure here (functional, NHWC):
* Swin-T backbone (models.swin) → 3 maps + extra stride-64 conv → 4
  levels, each 1×1-projected + GroupNorm(32) to 256.
* BERT-base (models.bert) → ``feat_map`` 768→256 text features.
* Encoder: per layer — BiAttention image↔text fusion, text self-attention
  (with sine position embeddings), deformable image self-attention + FFN.
* Language-guided query selection: top-900 image tokens by max similarity
  to text; initial boxes from a shared bbox head; learned content queries
  (``embed_init_tgt``).
* Decoder: per layer — query self-attention, text cross-attention,
  deformable image cross-attention, FFN; iterative box refinement with a
  shared MLP head; classification = contrastive dot with text features.

Deformable attention is gather-based bilinear sampling (TPU has no
grid_sample primitive; this is the JAX-native formulation — SURVEY §7
"hard parts"). All shapes static per input bucket.
"""

from __future__ import annotations

import os
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tbist_tpu.models import bert as bert_lib
from tbist_tpu.models import swin as swin_lib

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "weights_cache"
)


class DinoConfig(NamedTuple):
    d_model: int = 256
    heads: int = 8
    levels: int = 4
    points: int = 4
    enc_layers: int = 6
    dec_layers: int = 6
    ffn: int = 2048
    num_queries: int = 900
    max_text_len: int = 256
    fusion_heads: int = 4
    fusion_dim: int = 1024


BASE = DinoConfig()


def _layer_norm(x, p, eps=1e-5):
    mean = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _group_norm(x, p, groups=32, eps=1e-5):
    """NHWC group norm (official: GroupNorm(32, 256); tiny test configs
    shrink the group count to the channel count)."""
    b, h, w, c = x.shape
    groups = min(groups, c)
    xg = x.reshape(b, h, w, groups, c // groups)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    return xg.reshape(b, h, w, c) * p["scale"] + p["bias"]


def _mha(q, k, v, p, heads, bias=None):
    """Standard MHA with separate projections (torch MultiheadAttention
    packing: in_proj covers q/k/v)."""
    b, tq, d = q.shape
    tk = k.shape[1]
    wq, wk, wv = jnp.split(p["in_proj_w"], 3, axis=1)
    bq, bk, bv = jnp.split(p["in_proj_b"], 3)
    qh = (q @ wq + bq).reshape(b, tq, heads, -1).transpose(0, 2, 1, 3)
    kh = (k @ wk + bk).reshape(b, tk, heads, -1).transpose(0, 2, 1, 3)
    vh = (v @ wv + bv).reshape(b, tk, heads, -1).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(d // heads)
    if bias is not None:
        logits = logits + bias
    attn = jax.nn.softmax(logits, -1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
    out = out.transpose(0, 2, 1, 3).reshape(b, tq, d)
    return out @ p["out_proj_w"] + p["out_proj_b"]


# ---------------------------------------------------------------------------
# deformable attention (gather-based bilinear sampling)
# ---------------------------------------------------------------------------


def _bilinear_sample(value_hw: jnp.ndarray, locs: jnp.ndarray) -> jnp.ndarray:
    """value_hw: (N, H, W, D); locs: (N, P, 2) normalized [0,1] (x, y).
    Zero padding outside; align_corners=False convention."""
    n, h, w, d = value_hw.shape
    x = locs[..., 0] * w - 0.5
    y = locs[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def gather(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat = value_hw.reshape(n, h * w, d)
        idx = yc * w + xc  # (N, P)
        out = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return out * inb[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - fx)[..., None] + v01 * fx[..., None]
    bot = v10 * (1 - fx)[..., None] + v11 * fx[..., None]
    return top * (1 - fy)[..., None] + bot * fy[..., None]


# XLA's TPU gather moves bytes at ~22 GB/s regardless of table size
# (benchmarks/PROFILE.md round-2e), so each of the 4-corner gathers costs
# the same ~2.4 ms whether the level table is 100x100 or 13x13. For small
# levels a DENSE interpolation matmul is far cheaper: build the (P, HW)
# bilinear-weight matrix (4 nonzeros per row, fused elementwise) and ride
# the MXU. Levels with HW <= this threshold take the matmul path.
# Measured on v5e at 800x800 (benchmarks/PROFILE.md round-3a): forward
# 327 ms (all-gather) -> 262 (level 3 dense) -> 205 (levels 2-3) ->
# 172 ms (levels 1-3, this default, -47%); including level 0 regresses to
# 242 ms (its 10k-wide matmul costs more than its gather). Boxes agree
# with the gather path to ~1e-5.
_INTERP_MM_MAX_HW = int(os.environ.get("TBIST_DINO_INTERP_MM_HW", "2500"))

# The gather's ~27 GB/s only holds while the level table stays small
# enough to sit in fast memory: at frame-batch 8 the level-0 table grows
# to (64, 10000, 32) f32 = 82 MB and the same corner gather collapses to
# 5.6 GB/s (161 ms vs 1.97 ms at B=1 — 10x worse PER FRAME, traced in
# benchmarks/PROFILE.md round-4b). Above this table-byte threshold the
# sampling maps over the batch axis inside the program (lax.map), so
# each step gathers from a B=1-sized table in the fast regime. B=1
# programs never hit this branch — the headline path is untouched.
_GATHER_MAP_TABLE_BYTES = int(
    os.environ.get("TBIST_DINO_GATHER_MAP_BYTES", str(16 * 1024 * 1024))
)


def _interp_matmul_sample(value_hw: jnp.ndarray, locs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling as one dense weight matmul (small levels).

    Equivalent to ``_bilinear_sample`` (zero padding outside,
    align_corners=False): W[p, hw] carries the 4 bilinear corner weights
    of sample p, and ``W @ values`` replaces 4 row gathers + lerp with one
    MXU contraction. Exact per-corner f32 weights; the contraction runs
    at HIGHEST precision so parity with the gather path holds to ~1e-6.
    """
    n, h, w, d = value_hw.shape
    x = locs[..., 0] * w - 0.5
    y = locs[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    hw_iota = jnp.arange(h * w, dtype=jnp.int32)  # (HW,)

    def corner_w(yi, xi, cw):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        idx = yc * w + xc  # (N, P)
        onehot = (idx[..., None] == hw_iota).astype(jnp.float32)  # (N, P, HW)
        return onehot * (cw * inb)[..., None]

    wmat = (
        corner_w(y0, x0, (1 - fx) * (1 - fy))
        + corner_w(y0, x0 + 1, fx * (1 - fy))
        + corner_w(y0 + 1, x0, (1 - fx) * fy)
        + corner_w(y0 + 1, x0 + 1, fx * fy)
    )
    flat = value_hw.reshape(n, h * w, d)
    return jax.lax.batch_matmul(
        wmat, flat, precision=jax.lax.Precision.HIGHEST
    )


def deformable_attention(
    query: jnp.ndarray,
    ref_points: jnp.ndarray,
    value: jnp.ndarray,
    spatial_shapes: Tuple[Tuple[int, int], ...],
    p: Dict,
    heads: int,
    points: int,
) -> jnp.ndarray:
    """Multi-scale deformable attention (Deformable-DETR semantics).

    query: (B, Lq, D); ref_points: (B, Lq, 2) or (B, Lq, 4) normalized;
    value: (B, Lv, D) flattened over levels with static spatial_shapes.
    """
    b, lq, d = query.shape
    levels = len(spatial_shapes)
    dh = d // heads

    v = value @ p["value_proj_w"] + p["value_proj_b"]
    offsets = query @ p["sampling_offsets_w"] + p["sampling_offsets_b"]
    offsets = offsets.reshape(b, lq, heads, levels, points, 2)
    weights = query @ p["attention_weights_w"] + p["attention_weights_b"]
    weights = jax.nn.softmax(
        weights.reshape(b, lq, heads, levels * points), -1
    ).reshape(b, lq, heads, levels, points)

    if ref_points.shape[-1] == 2:
        normalizer = jnp.asarray(
            [[wl, hl] for (hl, wl) in spatial_shapes], jnp.float32
        )  # (levels, 2) in (x, y) order
        locs = (
            ref_points[:, :, None, None, None, :]
            + offsets / normalizer[None, None, None, :, None, :]
        )
    else:
        xy = ref_points[..., :2]
        wh = ref_points[..., 2:]
        locs = (
            xy[:, :, None, None, None, :]
            + offsets / points * wh[:, :, None, None, None, :] * 0.5
        )

    out = jnp.zeros((b, lq, heads, dh), jnp.float32)
    start = 0
    for li, (hl, wl) in enumerate(spatial_shapes):
        vl = v[:, start : start + hl * wl].reshape(b, hl, wl, heads, dh)
        vl = vl.transpose(0, 3, 1, 2, 4).reshape(b * heads, hl, wl, dh)
        loc_l = locs[:, :, :, li].transpose(0, 2, 1, 3, 4)  # (B, heads, Lq, points, 2)
        loc_l = loc_l.reshape(b * heads, lq * points, 2)
        # small levels: dense interp-matmul beats the ~22 GB/s TPU gather;
        # the matmul path only pays when there are enough samples to
        # amortize (the decoder's 900 queries stay on the gather path)
        use_mm = hl * wl <= _INTERP_MM_MAX_HW and lq * points >= 4096
        if use_mm:
            sampled = _interp_matmul_sample(vl, loc_l)
        elif b > 1 and b * heads * hl * wl * dh * 4 > _GATHER_MAP_TABLE_BYTES:
            # frame-batched large level: gather per frame inside the
            # program so each step's table stays in the fast regime
            # (see _GATHER_MAP_TABLE_BYTES)
            vl_b = vl.reshape(b, heads, hl, wl, dh)
            loc_b = loc_l.reshape(b, heads, lq * points, 2)
            sampled = jax.lax.map(
                lambda args: _bilinear_sample(*args), (vl_b, loc_b)
            ).reshape(b * heads, lq * points, dh)
        else:
            sampled = _bilinear_sample(vl, loc_l)
        sampled = sampled.reshape(b, heads, lq, points, dh)
        w_l = weights[:, :, :, li].transpose(0, 2, 1, 3)  # (B, heads, Lq, points)
        out = out + jnp.einsum("bhqp,bhqpd->bqhd", w_l, sampled)
        start += hl * wl

    return out.reshape(b, lq, d) @ p["output_proj_w"] + p["output_proj_b"]


# ---------------------------------------------------------------------------
# fusion (bi-directional image<->text attention)
# ---------------------------------------------------------------------------


def bi_attention(img, text, text_mask, p, cfg: DinoConfig):
    """BiMultiHeadAttention: joint attention map, image->text and
    text->image updates with per-branch LN + learned layer-scale gammas.

    NOTE the residual connections add onto the LAYER-NORMED features (the
    un-normed inputs are discarded) — official BiAttentionBlock semantics,
    verified against transformers.GroundingDinoFusionLayer."""
    b, li, d = img.shape
    lt = text.shape[1]
    h = cfg.fusion_heads
    dh = cfg.fusion_dim // h
    scale = dh**-0.5

    vi = _layer_norm(img, p["ln_v"])
    tx = _layer_norm(text, p["ln_l"])
    q = (vi @ p["v_proj_w"] + p["v_proj_b"]) * scale
    k = tx @ p["l_proj_w"] + p["l_proj_b"]
    vv = vi @ p["values_v_w"] + p["values_v_b"]
    vl = tx @ p["values_l_w"] + p["values_l_b"]

    def split(x, t):
        return x.reshape(b, t, h, dh).transpose(0, 2, 1, 3)

    qh, kh = split(q, li), split(k, lt)
    vvh, vlh = split(vv, li), split(vl, lt)

    logits = jnp.einsum("bhid,bhtd->bhit", qh, kh)  # (B, h, Li, Lt)
    # numerical stabilization as in the official impl
    logits = logits - jnp.max(logits, axis=(-2, -1), keepdims=True)
    logits_t = logits.transpose(0, 1, 3, 2)  # text->image

    tmask = (1.0 - text_mask[:, None, None, :]) * -1e9  # mask padded text
    attn_i = jax.nn.softmax(logits + tmask, -1)
    attn_t = jax.nn.softmax(logits_t, -1)

    di = jnp.einsum("bhit,bhtd->bhid", attn_i, vlh)
    dt = jnp.einsum("bhti,bhid->bhtd", attn_t, vvh)
    di = di.transpose(0, 2, 1, 3).reshape(b, li, cfg.fusion_dim)
    dt = dt.transpose(0, 2, 1, 3).reshape(b, lt, cfg.fusion_dim)
    img = vi + p["gamma_v"] * (di @ p["out_v_w"] + p["out_v_b"])
    text = tx + p["gamma_l"] * (dt @ p["out_l_w"] + p["out_l_b"])
    return img, text


# ---------------------------------------------------------------------------
# position embeddings
# ---------------------------------------------------------------------------


def _sine_pos_2d(h: int, w: int, d: int, temp_h=20.0, temp_w=20.0) -> jnp.ndarray:
    """(H*W, D) sine embedding, PositionEmbeddingSineHW with the config's
    temperatures (pe_temperatureH/W = 20, GroundingDINO_SwinT_OGC.py:5-6)."""
    half = d // 2
    ys = (jnp.arange(h, dtype=jnp.float32) + 1.0) / h * (2 * np.pi)
    xs = (jnp.arange(w, dtype=jnp.float32) + 1.0) / w * (2 * np.pi)
    dim_t = jnp.arange(half // 2, dtype=jnp.float32)

    def emb(vals, temp):
        freq = temp ** (2 * dim_t / half)
        ang = vals[:, None] / freq[None, :]
        return jnp.stack([jnp.sin(ang), jnp.cos(ang)], -1).reshape(vals.shape[0], -1)

    ey = emb(ys, temp_h)  # (H, half)
    ex = emb(xs, temp_w)  # (W, half)
    pos = jnp.concatenate(
        [
            jnp.broadcast_to(ey[:, None, :], (h, w, half)),
            jnp.broadcast_to(ex[None, :, :], (h, w, half)),
        ],
        -1,
    )
    return pos.reshape(h * w, d)


def _sine_pos_1d(coords: jnp.ndarray, d: int = 128, temp: float = 10000.0):
    """(...,): coord in [0,1] -> (..., d) sine embedding (DETR box PE)."""
    scale = 2 * np.pi
    dim_t = temp ** (2 * (jnp.arange(d // 2, dtype=jnp.float32))[None] / d)
    ang = (coords[..., None] * scale) / dim_t
    return jnp.stack([jnp.sin(ang), jnp.cos(ang)], -1).reshape(*coords.shape, d)


def _box_pe(boxes: jnp.ndarray, d_model: int) -> jnp.ndarray:
    """cxcywh (..., 4) -> (..., 2*d_model) sine embedding.

    Coordinate order is [pos(y), pos(x), pos(w), pos(h)] — the official
    gen_sineembed_for_position / HF get_sine_pos_embed(exchange_xy=True)
    swap x and y in the output."""
    parts = [_sine_pos_1d(boxes[..., i], d_model // 2) for i in (1, 0, 2, 3)]
    return jnp.concatenate(parts, -1)


# [CLS], [SEP], '.', '?' in the bert-base-uncased vocab — the tokens that
# close a sub-sentence block (official groundingdino.get_tokenlizer /
# transformers grounding_dino SPECIAL_TOKENS).
SPECIAL_TOKEN_IDS = (101, 102, 1012, 1029)


def build_text_token_masks(
    input_ids: jnp.ndarray, special_ids=SPECIAL_TOKEN_IDS
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sub-sentence self-attention masks + restarted position ids.

    Vectorized (jit-compatible) equivalent of the official
    ``generate_masks_with_special_tokens_and_transfer_map``: tokens between
    consecutive special tokens attend only within their block (including
    the closing special token); a special token at position 0 or T-1 only
    attends to itself; position ids restart at 0 inside each block.
    Returns (attend (B, T, T) bool, position_ids (B, T) int32).
    """
    b, t = input_ids.shape
    special = jnp.zeros((b, t), bool)
    for sid in special_ids:
        special = special | (input_ids == sid)
    # position 0 is an implicit block boundary (the official loop starts
    # previous_col = 0): the first block always begins at position 1
    special = special.at[:, 0].set(True)
    idx = jnp.arange(t)

    # next special at-or-after i (t if none); previous special strictly
    # before i (-1 if none)
    nxt = jnp.flip(
        jax.lax.cummin(jnp.flip(jnp.where(special, idx, t), -1), axis=1), -1
    )
    prev = jax.lax.cummax(jnp.where(special, idx, -1), axis=1)
    prev = jnp.concatenate([jnp.full((b, 1), -1, prev.dtype), prev[:, :-1]], -1)

    # a block is only "closed" by a special token at an interior position
    interior = (nxt > 0) & (nxt < t - 1)
    attend = (nxt[:, :, None] == nxt[:, None, :]) & interior[:, :, None]
    attend = attend | jnp.eye(t, dtype=bool)[None]
    position_ids = jnp.where(interior, idx[None] - prev - 1, 0).astype(jnp.int32)
    return attend, position_ids


def _mlp(x, layers, act=jax.nn.relu):
    n = len(layers)
    for i, p in enumerate(layers):
        x = x @ p["w"] + p["b"]
        if i < n - 1:
            x = act(x)
    return x


def _inverse_sigmoid(x, eps=1e-3):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


# ---------------------------------------------------------------------------
# full forward
# ---------------------------------------------------------------------------


def encode_text(
    params,
    cfg: DinoConfig,
    input_ids: jnp.ndarray,
    text_mask: jnp.ndarray,
    bert_cfg: bert_lib.BertConfig = bert_lib.BASE,
) -> jnp.ndarray:
    """The prompt-only prefix of the forward pass: BERT-base with the
    sub-sentence attention mask + the 768->256 feat_map projection.

    This is the only text computation independent of the image (the
    fusion layers update text features per encoder layer), so it is what
    a video run can compute ONCE per prompt and reuse across frames
    (dino_sam caches it keyed by prompt). Returns (B, T, 256)."""
    text_self_attend, position_ids = build_text_token_masks(input_ids)
    text_self_bias = (
        1.0 - text_self_attend.astype(jnp.float32)[:, None]
    ) * -1e9  # (B, 1, T, T)
    text_h = bert_lib.forward(
        params["bert"],
        bert_cfg,
        input_ids,
        text_mask.astype(jnp.float32),
        position_ids=position_ids,
        attention_bias=text_self_bias,
    )
    return text_h @ params["feat_map_w"] + params["feat_map_b"]


def forward(
    params,
    cfg: DinoConfig,
    image: jnp.ndarray,
    input_ids: jnp.ndarray,
    text_mask: jnp.ndarray,
    swin_cfg: swin_lib.SwinConfig = swin_lib.TINY,
    bert_cfg: bert_lib.BertConfig = bert_lib.BASE,
    text_feats: jnp.ndarray | None = None,
) -> Dict[str, jnp.ndarray]:
    """image: (1, H, W, 3) ImageNet-normalized (H, W mult of 32);
    input_ids/text_mask: (1, T) BERT tokens. Returns
    {"pred_logits": (1, 900, T), "pred_boxes": (1, 900, 4 cxcywh)}.
    ``text_feats`` optionally supplies a precomputed ``encode_text``
    result (prompt cache across video frames); None computes it inline.
    """
    # ---- backbone + projections ----
    feats = swin_lib.forward(params["swin"], swin_cfg, image)
    srcs = []
    for i, f in enumerate(feats):
        x = jax.lax.conv_general_dilated(
            f, params["input_proj"][i]["w"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params["input_proj"][i]["b"]
        srcs.append(_group_norm(x, params["input_proj"][i]["gn"]))
    # torch Conv2d(k=3, s=2, p=1) pads 1 on BOTH sides; lax "SAME" at
    # stride 2 would pad (0, 1) and sample different windows
    extra = jax.lax.conv_general_dilated(
        feats[-1], params["input_proj"][3]["w"], (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["input_proj"][3]["b"]
    srcs.append(_group_norm(extra, params["input_proj"][3]["gn"]))

    spatial_shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)
    b = image.shape[0]
    src_flat = jnp.concatenate([s.reshape(b, -1, cfg.d_model) for s in srcs], 1)
    pos_flat = jnp.concatenate(
        [
            _sine_pos_2d(h, w, cfg.d_model)[None] + params["level_embed"][li][None, None]
            for li, (h, w) in enumerate(spatial_shapes)
        ],
        1,
    )

    # ---- text encoder ----
    # Sub-sentence attention: blocks between special tokens with restarted
    # position ids (official generate_masks_with_special_tokens_and_
    # transfer_map) — applied in BERT and in every text-enhancer layer.
    text_self_attend, position_ids = build_text_token_masks(input_ids)
    text_self_bias = (
        1.0 - text_self_attend.astype(jnp.float32)[:, None]
    ) * -1e9  # (B, 1, T, T)
    if text_feats is None:
        text_feats = encode_text(params, cfg, input_ids, text_mask, bert_cfg)
    text = text_feats  # (B, T, 256)
    tmaskf = text_mask.astype(jnp.float32)
    t = text.shape[1]
    # sine embedding of the RAW restarted position ids (temperature 10000,
    # d_model feats) — official get_sine_pos_embed, NOT normalized arange
    text_pos = _sine_pos_1d(position_ids.astype(jnp.float32), cfg.d_model)

    # ---- encoder ----
    img = src_flat
    # reference points for encoder deformable self-attn: pixel centers / level
    refs = []
    for (h, w) in spatial_shapes:
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        refs.append(jnp.stack([gx, gy], -1).reshape(-1, 2))
    enc_ref = jnp.concatenate(refs, 0)[None]  # (1, Lv, 2)
    enc_ref = jnp.broadcast_to(enc_ref, (b, enc_ref.shape[1], 2))

    for li in range(cfg.enc_layers):
        fus = params["fusion_layers"][li]
        img, text = bi_attention(img, text, tmaskf, fus, cfg)

        tl = params["text_layers"][li]
        q = text + text_pos
        # text-enhance layers use nhead//2 heads (official TextTransformer)
        # and the sub-sentence block mask, not the padding mask
        text = text + _mha(
            q, q, text, tl["self_attn"], cfg.heads // 2, bias=text_self_bias
        )
        text = _layer_norm(text, tl["ln1"])
        hft = jax.nn.relu(text @ tl["fc1_w"] + tl["fc1_b"])
        text = _layer_norm(text + (hft @ tl["fc2_w"] + tl["fc2_b"]), tl["ln2"])

        el = params["enc_layers"][li]
        img2 = deformable_attention(
            img + pos_flat, enc_ref, img, spatial_shapes, el["deform"],
            cfg.heads, cfg.points,
        )
        img = _layer_norm(img + img2, el["ln1"])
        hfi = jax.nn.relu(img @ el["fc1_w"] + el["fc1_b"])
        img = _layer_norm(img + (hfi @ el["fc2_w"] + el["fc2_b"]), el["ln2"])

    # ---- language-guided query selection ----
    # anchors: grid centers + level-dependent size, INTERIOR-valid only
    # (coords within (0.01, 0.99) — generate_encoder_output_proposals);
    # invalid anchors get +inf logits (box -> 1.0) and their image tokens
    # are zeroed before the enc_output projection, exactly as the official
    # masked_fill(~valid, 0.0) does.
    anchors = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        wh = jnp.full((h * w, 2), 0.05 * (2.0**lvl), jnp.float32)
        anchors.append(
            jnp.concatenate([jnp.stack([gx, gy], -1).reshape(-1, 2), wh], -1)
        )
    anchors = jnp.concatenate(anchors, 0)  # (Lv, 4) in sigmoid space
    anchor_valid = jnp.all((anchors > 0.01) & (anchors < 0.99), -1)  # (Lv,)
    anchor_logits = jnp.where(
        anchor_valid[:, None], jnp.log(anchors / (1.0 - anchors)), jnp.inf
    )[None]
    anchor_logits = jnp.broadcast_to(anchor_logits, (b, anchors.shape[0], 4))

    enc_out = _layer_norm(
        jnp.where(anchor_valid[None, :, None], img, 0.0)
        @ params["enc_output_w"]
        + params["enc_output_b"],
        params["enc_output_ln"],
    )
    # contrastive scores vs text (max over text tokens)
    sim = jnp.einsum("bld,btd->blt", enc_out, text)
    sim = jnp.where(tmaskf[:, None, :] > 0, sim, -jnp.inf)
    scores = jnp.max(sim, -1)  # (B, Lv)
    topk = jnp.argsort(scores, axis=-1)[:, ::-1][:, : cfg.num_queries]

    sel = jnp.take_along_axis(enc_out, topk[..., None], axis=1)  # (B, 900, 256)
    sel_anchor_logits = jnp.take_along_axis(anchor_logits, topk[..., None], axis=1)
    delta = _mlp(sel, params["enc_bbox_mlp"])
    ref_boxes = jax.nn.sigmoid(delta + sel_anchor_logits)  # (B, 900, 4)

    queries = jnp.broadcast_to(
        params["tgt_embed"][None], (b, cfg.num_queries, cfg.d_model)
    )

    # ---- decoder ----
    ref_prev = ref_boxes  # refs INPUT to the last layer (final box head)
    for li in range(cfg.dec_layers):
        dl = params["dec_layers"][li]
        qpe = _mlp(_box_pe(ref_boxes, cfg.d_model), params["ref_point_head"])
        q = queries + qpe
        queries = queries + _mha(q, q, queries, dl["self_attn"], cfg.heads)
        queries = _layer_norm(queries, dl["ln_self"])
        # text cross attention
        queries = queries + _mha(
            queries + qpe, text, text, dl["text_cross"], cfg.heads,
            bias=(1.0 - tmaskf[:, None, None, :]) * -1e9,
        )
        queries = _layer_norm(queries, dl["ln_text"])
        # deformable image cross attention
        q2 = deformable_attention(
            queries + qpe, ref_boxes, img, spatial_shapes, dl["deform"],
            cfg.heads, cfg.points,
        )
        queries = _layer_norm(queries + q2, dl["ln_cross"])
        hf = jax.nn.relu(queries @ dl["fc1_w"] + dl["fc1_b"])
        queries = _layer_norm(queries + (hf @ dl["fc2_w"] + dl["fc2_b"]), dl["ln_ffn"])
        # iterative box refinement (shared head, applied to the UN-normed
        # layer output; refs detached in the original — a no-op here)
        delta = _mlp(queries, params["bbox_mlp"])
        ref_prev = ref_boxes
        ref_boxes = jax.nn.sigmoid(delta + _inverse_sigmoid(ref_boxes))

    # ---- outputs ----
    # The official forward recomputes the final boxes from the LAYER-NORMED
    # last decoder state + the refs INPUT to the last layer (groundingdino
    # forward's outputs_coord_list; HF GroundingDinoForObjectDetection) —
    # NOT the decoder-internal ref_boxes, which were refined from the
    # un-normed output. Class logits = plain contrastive dot with the
    # encoder-updated text (no scaling; box_threshold=0.3 is calibrated
    # against sigmoid of these logits).
    queries = _layer_norm(queries, params["dec_norm"])
    pred_boxes = jax.nn.sigmoid(
        _mlp(queries, params["bbox_mlp"]) + _inverse_sigmoid(ref_prev)
    )
    logits = jnp.einsum("bqd,btd->bqt", queries, text)
    logits = jnp.where(tmaskf[:, None, :] > 0, logits, -jnp.inf)
    return {"pred_logits": logits, "pred_boxes": pred_boxes}


# ---------------------------------------------------------------------------
# init (structure tests)
# ---------------------------------------------------------------------------


def init_params(
    key: jax.Array,
    cfg: DinoConfig = BASE,
    swin_cfg: swin_lib.SwinConfig = swin_lib.TINY,
    bert_cfg: bert_lib.BertConfig = bert_lib.BASE,
) -> Dict:
    keys = iter(jax.random.split(key, 1024))

    def nrm(shape, scale=0.02):
        return jax.random.normal(next(keys), shape, jnp.float32) * scale

    def ln(dim):
        return {"scale": jnp.ones(dim, jnp.float32), "bias": jnp.zeros(dim, jnp.float32)}

    def lin(cin, cout):
        return {"w": nrm((cin, cout)), "b": jnp.zeros(cout, jnp.float32)}

    def mha(d):
        return {
            "in_proj_w": nrm((d, 3 * d)),
            "in_proj_b": jnp.zeros(3 * d, jnp.float32),
            "out_proj_w": nrm((d, d)),
            "out_proj_b": jnp.zeros(d, jnp.float32),
        }

    def deform(d):
        hlp = cfg.heads * cfg.levels * cfg.points
        return {
            "value_proj_w": nrm((d, d)), "value_proj_b": jnp.zeros(d, jnp.float32),
            "sampling_offsets_w": nrm((d, hlp * 2), 0.001),
            "sampling_offsets_b": nrm((hlp * 2,), 0.01),
            "attention_weights_w": nrm((d, hlp), 0.001),
            "attention_weights_b": jnp.zeros(hlp, jnp.float32),
            "output_proj_w": nrm((d, d)), "output_proj_b": jnp.zeros(d, jnp.float32),
        }

    d = cfg.d_model
    swin_dims = [swin_cfg.embed_dim * (2**i) for i in swin_cfg.out_indices]
    input_proj = []
    for i in range(3):
        input_proj.append(
            {
                "w": nrm((1, 1, swin_dims[i], d)),
                "b": jnp.zeros(d, jnp.float32),
                "gn": {"scale": jnp.ones(d, jnp.float32), "bias": jnp.zeros(d, jnp.float32)},
            }
        )
    input_proj.append(
        {
            "w": nrm((3, 3, swin_dims[-1], d)),
            "b": jnp.zeros(d, jnp.float32),
            "gn": {"scale": jnp.ones(d, jnp.float32), "bias": jnp.zeros(d, jnp.float32)},
        }
    )

    def fusion():
        fd = cfg.fusion_dim
        return {
            "ln_v": ln(d), "ln_l": ln(d),
            "v_proj_w": nrm((d, fd)), "v_proj_b": jnp.zeros(fd, jnp.float32),
            "l_proj_w": nrm((d, fd)), "l_proj_b": jnp.zeros(fd, jnp.float32),
            "values_v_w": nrm((d, fd)), "values_v_b": jnp.zeros(fd, jnp.float32),
            "values_l_w": nrm((d, fd)), "values_l_b": jnp.zeros(fd, jnp.float32),
            "out_v_w": nrm((fd, d)), "out_v_b": jnp.zeros(d, jnp.float32),
            "out_l_w": nrm((fd, d)), "out_l_b": jnp.zeros(d, jnp.float32),
            "gamma_v": jnp.full((d,), 0.125, jnp.float32),
            "gamma_l": jnp.full((d,), 0.125, jnp.float32),
        }

    def text_layer():
        tf = cfg.ffn // 2  # official text enhancer FFN = encoder_ffn_dim/2
        return {
            "self_attn": mha(d),
            "ln1": ln(d), "ln2": ln(d),
            "fc1_w": nrm((d, tf)), "fc1_b": jnp.zeros(tf, jnp.float32),
            "fc2_w": nrm((tf, d)), "fc2_b": jnp.zeros(d, jnp.float32),
        }

    def enc_layer():
        return {
            "deform": deform(d),
            "ln1": ln(d), "ln2": ln(d),
            "fc1_w": nrm((d, cfg.ffn)), "fc1_b": jnp.zeros(cfg.ffn, jnp.float32),
            "fc2_w": nrm((cfg.ffn, d)), "fc2_b": jnp.zeros(d, jnp.float32),
        }

    def dec_layer():
        return {
            "self_attn": mha(d),
            "text_cross": mha(d),
            "deform": deform(d),
            "ln_self": ln(d), "ln_text": ln(d), "ln_cross": ln(d), "ln_ffn": ln(d),
            "fc1_w": nrm((d, cfg.ffn)), "fc1_b": jnp.zeros(cfg.ffn, jnp.float32),
            "fc2_w": nrm((cfg.ffn, d)), "fc2_b": jnp.zeros(d, jnp.float32),
        }

    return {
        "swin": swin_lib.init_params(next(keys), swin_cfg),
        "bert": bert_lib.init_params(next(keys), bert_cfg),
        "feat_map_w": nrm((bert_cfg.hidden, d)),
        "feat_map_b": jnp.zeros(d, jnp.float32),
        "input_proj": input_proj,
        "level_embed": nrm((cfg.levels, d)),
        "fusion_layers": [fusion() for _ in range(cfg.enc_layers)],
        "text_layers": [text_layer() for _ in range(cfg.enc_layers)],
        "enc_layers": [enc_layer() for _ in range(cfg.enc_layers)],
        "dec_layers": [dec_layer() for _ in range(cfg.dec_layers)],
        "enc_output_w": nrm((d, d)),
        "enc_output_b": jnp.zeros(d, jnp.float32),
        "enc_output_ln": ln(d),
        "enc_bbox_mlp": [lin(d, d), lin(d, d), lin(d, 4)],
        "ref_point_head": [lin(2 * d, d), lin(d, d)],
        "dec_norm": ln(d),
        "bbox_mlp": [lin(d, d), lin(d, d), lin(d, 4)],
        "tgt_embed": nrm((cfg.num_queries, d)),
    }
