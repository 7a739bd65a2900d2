"""Text→mask extraction entry points.

Real models: GroundingDINO+SAM (tbist_tpu.models.dino / .sam) for location
masks — reference text/TextMaskExtractor.py — and T5-emojilm + font
rasterization for texture stencils — reference text/EmojiMaskExtractor.py.

This environment ships no checkpoints (and no emoji font — it is a missing
blob even in the reference snapshot, .MISSING_LARGE_BLOBS:4), so each
extractor resolves to the real model when its weights exist and otherwise
to a documented deterministic fallback that keeps the full pipeline
runnable: a GrabCut-style center-prior segmentation for location masks, and
PIL glyph rasterization of the prompt for texture stencils.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax.numpy as jnp
import numpy as np

from tbist_tpu.utils.logging import logger

EMOJI_SIZE = 172  # reference stencil canvas (EmojiMaskExtractor.py:62)


def _fallback_location_mask(image: jnp.ndarray, prompt: str, **_kw) -> jnp.ndarray:
    """Deterministic saliency-ish mask when no DINO/SAM weights exist.

    Segments by color distance to the border-mean (background prior) —
    crude but stable, prompt-independent, and shaped exactly like the real
    extractor's output ((H, W) bool).
    """
    arr = np.asarray(image[0] if image.ndim == 4 else image)
    h, w = arr.shape[:2]
    border = np.concatenate(
        [arr[0], arr[-1], arr[:, 0], arr[:, w - 1]], axis=0
    )
    bg = border.mean(axis=0)
    dist = np.linalg.norm(arr - bg, axis=-1)
    thresh = dist.mean() + 0.5 * dist.std()
    return jnp.asarray(dist > thresh)


def _fallback_emoji_stencil(prompt: str) -> jnp.ndarray:
    """Rasterize the prompt's first character as a 172×172 bool stencil.

    Mirrors the reference's PIL draw-on-white + ``pixel < 255`` threshold
    (EmojiMaskExtractor.py:62-70) using the default bitmap font scaled up.
    """
    from PIL import Image, ImageDraw, ImageFont

    char = (prompt.strip() or "*")[0].upper()
    img = Image.new("L", (32, 32), 255)
    draw = ImageDraw.Draw(img)
    font = ImageFont.load_default()
    draw.text((8, 8), char, 0, font=font)
    big = img.resize((EMOJI_SIZE, EMOJI_SIZE), Image.NEAREST)
    return jnp.asarray(np.asarray(big) < 255)


def _detection_kwargs(tcfg) -> dict:
    """det_size/det_max kwargs for a non-default detection resolution
    (TextEffectConfig.detection_size — TPU-native extension; the reference
    hardcodes RandomResize([800], max 1333),
    groundingdino_text_object_detector.py:43-49). Empty at the defaults so
    custom/fallback extractors with an (image, prompt) signature keep
    working; an extractor that should honor the knob must accept the
    det_size/det_max keywords (the production DINO+SAM ones do)."""
    det = int(getattr(tcfg, "detection_size", 800) or 800)
    det_max = int(getattr(tcfg, "detection_max_size", 1333) or 1333)
    seg = int(getattr(tcfg, "segmentation_size", 0) or 0)
    if det == 800 and det_max == 1333 and seg in (0, 1024):
        return {}
    kw = {"det_size": det, "det_max": det_max}
    if seg not in (0, 1024):
        kw["seg_size"] = seg
    return kw


def extract_location_mask(extractor: Callable, image, tcfg) -> jnp.ndarray:
    """Run ``extractor`` with the TextMaskExtractor preprocess options.

    With default options this is just ``extractor(image, prompt)``. With
    crop/square/resize set (TextEffectConfig.mask_crop/mask_square/
    mask_resize — reference TextMaskExtractor.py:70-131), the detection
    input is preprocessed first and the resulting mask is placed back into
    the content frame's coordinates (False outside the crop window), so
    downstream composites stay aligned. Returns an (H, W) bool mask in the
    ORIGINAL image's shape.
    """
    crop = tuple(tcfg.mask_crop)
    resize = tuple(tcfg.mask_resize)
    det_kw = _detection_kwargs(tcfg)
    if crop == (0, 0, 0, 0) and not tcfg.mask_square and not resize:
        return extractor(image, tcfg.location_prompt, **det_kw)

    from tbist_tpu.models import dino_sam

    arr = np.asarray(image[0] if np.asarray(image).ndim == 4 else image)
    h, w = arr.shape[:2]
    if arr.dtype.kind == "f":
        arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
    left, right, top, bottom = (int(v) for v in crop)
    rh, rw = (int(resize[0]), int(resize[1])) if resize else (512, 512)
    pre, (oy, ox, ph, pw) = dino_sam.preprocess_image(
        arr, resize=bool(resize), square=tcfg.mask_square, height=rh,
        width=rw, left=left, right=right, top=top, bottom=bottom,
        return_offsets=True,
    )
    # extractors accept (H, W, 3) uint8 directly — no float round-trip,
    # and uploads (if any) stay uint8 per the project transfer rule
    m = np.asarray(extractor(pre, tcfg.location_prompt, **det_kw))
    if m.shape != (ph, pw):  # undo the resize
        import jax

        m = (
            np.asarray(
                jax.image.resize(jnp.asarray(m, jnp.float32), (ph, pw),
                                 "bilinear")
            )
            > 0.5
        )
    full = np.zeros((h, w), bool)
    full[oy : oy + ph, ox : ox + pw] = m.astype(bool)
    return jnp.asarray(full)


@functools.lru_cache(maxsize=1)
def default_mask_extractor() -> Callable:
    try:
        from tbist_tpu.models import dino_sam

        return dino_sam.get_mask_extractor()
    except Exception:
        from tbist_tpu.utils import degraded

        degraded.mark("mask_extractor", "mask_fallback")
        logger.warning(
            "mask extractor: no GroundingDINO/SAM weights — using "
            "border-prior fallback segmentation"
        )
        return _fallback_location_mask


@functools.lru_cache(maxsize=1)
def default_batch_mask_extractor() -> Callable:
    """(B, H, W, 3) uint8 frames + ONE prompt -> (B, H, W) bool masks.

    Real DINO+SAM when checkpoints exist: one detection + one
    segmentation program per frame chunk (models.dino_sam
    .extract_masks_batch — the masked-text video lane's extractor).
    Otherwise the per-frame fallback, stacked on host."""
    try:
        from tbist_tpu.models import dino_sam

        return dino_sam.get_batch_mask_extractor()
    except Exception:
        from tbist_tpu.utils import degraded

        degraded.mark("mask_extractor", "mask_fallback")
        logger.warning(
            "batch mask extractor: no GroundingDINO/SAM weights — using "
            "border-prior fallback segmentation per frame"
        )

        def batch_fallback(frames, prompt: str, **_kw) -> jnp.ndarray:
            arr = np.asarray(frames)  # device chunks fetch once here
            return jnp.stack(
                [_fallback_location_mask(f, prompt) for f in arr]
            )

        return batch_fallback


@functools.lru_cache(maxsize=1)
def default_emoji_extractor() -> Callable:
    try:
        from tbist_tpu.models import t5_emoji

        return t5_emoji.get_emoji_extractor()
    except Exception:
        from tbist_tpu.utils import degraded

        degraded.mark("emoji_extractor", "emoji_fallback")
        logger.warning(
            "emoji extractor: no T5-emojilm weights/font — rasterizing the "
            "prompt's first character as the stencil"
        )
        return _fallback_emoji_stencil
