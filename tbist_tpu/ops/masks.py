"""Mask compositing: binary-mask merge and the emoji texture-mask merge.

Reference semantics:

* ``composite_by_mask`` — text/segmentation_style_transfer.py:5-94
  (hard select, or Gaussian-feathered alpha blend).
* ``merge_content_style_masks`` / ``emoji_composite`` —
  text/emoji_segmentation_style_transfer.py:6-179.

The reference's emoji merge runs 6 scales × 4 corner anchors of pure-Python
sliding-window loops — its dominant CPU cost (SURVEY §3.2). Here each
anchor pass is one batched gather → per-window normalize → one scatter-add,
entirely on device under jit:

* every window is a full-size ``kh×kw`` slice of a zero-padded mask (the
  reference's boundary cropping is equivalent to zero padding, since the
  per-window normalizer ``max(region*emoji)`` ignores zero products);
* the 4 anchors differ only in which side the padding goes.

The reference's RT/RB anchors use ``kernel_H`` where ``kernel_W`` is meant
(emoji_segmentation_style_transfer.py:130,163) — emoji stencils are square
so the expressions coincide; we implement the square-stencil semantics.
"""

from __future__ import annotations

import functools
import math
import jax
import jax.numpy as jnp
import numpy as np

from tbist_tpu.ops.filters import blur_mask
from tbist_tpu.ops.resize import center_crop_to_match, resize_bilinear

EMOJI_SCALES = (0.5, 1.0, 1.5, 2.0, 2.5, 3.0)


def composite_by_mask(
    content: jnp.ndarray,
    style: jnp.ndarray,
    mask: jnp.ndarray,
    edge_smoothing: int = 5,
) -> jnp.ndarray:
    """Merge NHWC content/style by a (H, W) mask; True selects style.

    ``edge_smoothing`` > 0 Gaussian-feathers the mask edge (odd-forced
    kernel). Shape mismatches are reconciled by center-cropping the larger
    image, exactly like the reference.
    """
    content, style, mask = center_crop_to_match(content, style, mask)
    if edge_smoothing:
        m = blur_mask(mask, int(edge_smoothing))
        m = m[None, ..., None]
        return content * (1.0 - m) + style * m
    sel = mask.astype(bool)[None, ..., None]
    return jnp.where(sel, style, content)


def _anchor_positions(extent: int, step: int, reverse: bool) -> np.ndarray:
    """Window start offsets in the padded array for one axis."""
    step = max(step, 1)
    if reverse:
        # reference: range(extent, 1, -step); in padded coords the start
        # equals the original end index (left/top padding of one kernel).
        return np.arange(extent, 1, -step, dtype=np.int32)
    return np.arange(0, extent, step, dtype=np.int32)


@functools.partial(jax.jit, static_argnames=("blur_strength", "step_size_multiplier"))
def merge_content_style_masks(
    seg_mask: jnp.ndarray,
    emoji_mask: jnp.ndarray,
    blur_strength: int = 95,
    step_size_multiplier: float = 0.5,
) -> jnp.ndarray:
    """Emoji-augmented soft mask in [0, 1], shape (H, W).

    ``seg_mask``: (H, W) bool/float segmentation mask.
    ``emoji_mask``: (He, We) bool/float emoji stencil (reference: 172×172).
    """
    h, w = seg_mask.shape
    blurred = blur_mask(seg_mask.astype(jnp.float32), int(blur_strength))
    emoji = emoji_mask.astype(jnp.float32)
    he, we = emoji.shape

    merged = jnp.zeros((h, w), jnp.float32)
    for scale in EMOJI_SCALES:
        kh, kw = int(he * scale), int(we * scale)
        if kh < 1 or kw < 1:
            continue
        em = resize_bilinear(emoji[..., None], (kh, kw))[:, :, 0]
        em = em / jnp.maximum(jnp.max(em), 1e-20)
        sh = max(math.floor(kh * step_size_multiplier), 1)
        sw = max(math.floor(kw * step_size_multiplier), 1)

        # In padded coordinates (one kernel each side), the anchors' window
        # starts are the union of two arithmetic grids per axis: forward
        # starts shifted by the leading pad, and reverse windows [i-k, i)
        # starting at padded index i. The 4 corner anchors are exactly the
        # cartesian products of these row/col grids.
        row_grids = [
            _anchor_positions(h, sh, False) + kh,
            _anchor_positions(h, sh, True),
        ]
        col_grids = [
            _anchor_positions(w, sw, False) + kw,
            _anchor_positions(w, sw, True),
        ]
        # slack so interleaved Q-cells may overhang the crop region
        q_r = -(-kh // sh)
        q_c = -(-kw // sw)
        slack_r, slack_c = q_r * sh, q_c * sw
        padded = jnp.pad(blurred, ((kh, kh + slack_r), (kw, kw + slack_c)))
        acc = jnp.zeros_like(padded)

        for rows in row_grids:
            for cols in col_grids:
                if rows.size == 0 or cols.size == 0:
                    continue
                acc = _grid_accumulate(
                    acc, padded, em, np.sort(rows), np.sort(cols), kh, kw, sh, sw
                )
        merged = merged + jax.lax.dynamic_slice(acc, (kh, kw), (h, w))

    return merged / jnp.maximum(jnp.max(merged), 1e-20)


def _grid_accumulate(acc, padded, em, rows, cols, kh, kw, sh, sw):
    """Add normalized window products for one regular start grid, scatter-free.

    Windows start at ``rows × cols`` (arithmetic grids with strides sh/sw).
    TPU scatters serialize, so instead the windows are partitioned into
    q_r×q_c interleaved groups whose members are spatially disjoint
    (group stride Q = ceil(k/s)·s ≥ k); each group's tiles, zero-padded to
    the Q-cell, concatenate into one contiguous block added with a static
    slice — pure reshapes and adds.
    """
    n_r, n_c = rows.size, cols.size
    q_r = -(-kh // sh)
    q_c = -(-kw // sw)
    big_q_r, big_q_c = q_r * sh, q_c * sw

    starts_r, starts_c = np.meshgrid(rows, cols, indexing="ij")
    starts = jnp.asarray(np.stack([starts_r.ravel(), starts_c.ravel()], axis=1))

    def window_fn(start):
        win = jax.lax.dynamic_slice(padded, (start[0], start[1]), (kh, kw))
        prod = win * em
        return prod / (jnp.max(prod) + 1e-7)

    tiles = jax.vmap(window_fn)(starts).reshape(n_r, n_c, kh, kw)
    tiles = jnp.pad(
        tiles, ((0, 0), (0, 0), (0, big_q_r - kh), (0, big_q_c - kw))
    )

    for a in range(min(q_r, n_r)):
        for b in range(min(q_c, n_c)):
            sub = tiles[a::q_r, b::q_c]  # disjoint along both axes
            na, nb = sub.shape[0], sub.shape[1]
            block = sub.transpose(0, 2, 1, 3).reshape(na * big_q_r, nb * big_q_c)
            rs = int(rows[a])
            cs = int(cols[b])
            acc = acc.at[rs : rs + na * big_q_r, cs : cs + nb * big_q_c].add(block)
    return acc


def composite_by_masks_batch(
    content: jnp.ndarray,
    style: jnp.ndarray,
    masks: jnp.ndarray,
    edge_smoothing: int = 5,
) -> jnp.ndarray:
    """Batched ``composite_by_mask``: (B, H, W, C) content/style with a
    per-frame (B, H, W) mask — the masked-text video lane composites a
    whole chunk in one program. All shapes must already match (the lane
    styles each frame at its own shape, so no center-crop reconciliation
    is needed); per-frame results equal composite_by_mask."""
    from tbist_tpu.ops.filters import blur_masks

    if edge_smoothing:
        m = blur_masks(masks, int(edge_smoothing))[..., None]
        return content * (1.0 - m) + style * m
    sel = masks.astype(bool)[..., None]
    return jnp.where(sel, style, content)


def emoji_composite_batch(
    content: jnp.ndarray,
    style: jnp.ndarray,
    seg_masks: jnp.ndarray,
    emoji_mask: jnp.ndarray,
    blur_strength: int = 95,
    step_size_multiplier: float = 0.5,
    style_strength: float = 2.0,
) -> jnp.ndarray:
    """Batched ``emoji_composite`` with per-frame (B, H, W) segmentation
    masks and one shared emoji stencil: the 6-scale×4-anchor merge runs
    vmapped per frame, the blend in one fused op."""
    merged = jax.vmap(
        lambda s: merge_content_style_masks(
            s, emoji_mask, int(blur_strength), float(step_size_multiplier)
        )
    )(seg_masks)
    # style_strength may be a traced scalar (jitted video-lane composite)
    merged = jnp.clip(merged * style_strength, 0.0, 1.0)[..., None]
    return content * (1.0 - merged) + style * merged


def emoji_composite(
    content: jnp.ndarray,
    style: jnp.ndarray,
    seg_mask: jnp.ndarray,
    emoji_mask: jnp.ndarray,
    blur_strength: int = 95,
    step_size_multiplier: float = 0.5,
    style_strength: float = 2.0,
) -> jnp.ndarray:
    """Texture-masked composite (emoji_segmentation_style_transfer.py:6-63)."""
    content, style, seg_mask = center_crop_to_match(content, style, seg_mask)
    merged = merge_content_style_masks(
        seg_mask, emoji_mask, int(blur_strength), float(step_size_multiplier)
    )
    merged = jnp.clip(merged * style_strength, 0.0, 1.0)[None, ..., None]
    return content * (1.0 - merged) + style * merged
