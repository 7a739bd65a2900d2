"""Resize / crop primitives with explicit sampling semantics.

The reference mixes three resize conventions: torch ``F.interpolate(...,
align_corners=True)`` (StyleMixer.py:34, ColorPaletteTransfer.py:43),
cv2 ``INTER_NEAREST`` (pixel_art.py:73-74) and cv2 ``INTER_LINEAR``
(emoji merge, emoji_segmentation_style_transfer.py:100). Each convention is
implemented here once, gather-based and jit/vmap-friendly (static output
shapes only).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def resize_nearest(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """cv2 INTER_NEAREST semantics: src index = floor(dst * src/dst).

    Accepts NHWC or HWC (batched on the leading axes via pure indexing).
    """
    h_out, w_out = out_hw
    h_in, w_in = x.shape[-3], x.shape[-2]
    rows = jnp.floor(jnp.arange(h_out) * (h_in / h_out)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(w_out) * (w_in / w_out)).astype(jnp.int32)
    rows = jnp.clip(rows, 0, h_in - 1)
    cols = jnp.clip(cols, 0, w_in - 1)
    out = jnp.take(x, rows, axis=-3)
    out = jnp.take(out, cols, axis=-2)
    return out


def _linear_weights(n_out: int, n_in: int, align_corners: bool):
    if align_corners and n_out > 1:
        src = jnp.arange(n_out) * ((n_in - 1) / (n_out - 1))
    else:
        # half-pixel-center convention (cv2 INTER_LINEAR / torch default)
        scale = n_in / n_out
        src = (jnp.arange(n_out) + 0.5) * scale - 0.5
    src = jnp.clip(src, 0.0, n_in - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n_in - 1)
    frac = (src - lo).astype(jnp.float32)
    return lo, hi, frac


def resize_bilinear(
    x: jnp.ndarray, out_hw: Tuple[int, int], align_corners: bool = False
) -> jnp.ndarray:
    """Bilinear resize over the (-3, -2) spatial axes of an (..., H, W, C) array.

    ``align_corners=True`` matches torch ``F.interpolate(align_corners=True)``;
    ``False`` matches cv2 INTER_LINEAR / torch default half-pixel centers.
    """
    h_out, w_out = out_hw
    h_in, w_in = x.shape[-3], x.shape[-2]
    dtype = x.dtype
    xf = x.astype(jnp.float32)

    rlo, rhi, rfrac = _linear_weights(h_out, h_in, align_corners)
    top = jnp.take(xf, rlo, axis=-3)
    bot = jnp.take(xf, rhi, axis=-3)
    rfrac = rfrac.reshape((h_out, 1, 1))
    rows = top * (1.0 - rfrac) + bot * rfrac

    clo, chi, cfrac = _linear_weights(w_out, w_in, align_corners)
    left = jnp.take(rows, clo, axis=-2)
    right = jnp.take(rows, chi, axis=-2)
    cfrac = cfrac.reshape((w_out, 1))
    out = left * (1.0 - cfrac) + right * cfrac
    return out.astype(dtype)


def center_crop_to_match(
    content: jnp.ndarray, style: jnp.ndarray, mask: jnp.ndarray | None = None
):
    """Shape reconciliation: center-crop the larger of two NHWC images.

    The reference assumes shape drift comes from CNN padding rounding and
    crops out the middle box of the larger image, cropping the mask together
    with the content image (segmentation_style_transfer.py:27-45). Shapes
    are static under jit, so this is trace-time Python.
    """
    ch, cw = content.shape[-3], content.shape[-2]
    sh, sw = style.shape[-3], style.shape[-2]
    h, w = min(ch, sh), min(cw, sw)

    def crop(x, th, tw):
        xh, xw = x.shape[-3], x.shape[-2]
        top = (xh - th) // 2
        left = (xw - tw) // 2
        return jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(x, top, top + th, axis=x.ndim - 3),
            left,
            left + tw,
            axis=x.ndim - 2,
        )

    content_c = crop(content, h, w)
    style_c = crop(style, h, w)
    if mask is not None:
        # the mask tracks the content image (same crop offsets)
        if mask.ndim == 2:
            m = mask[None, ..., None]
            m = crop(m, h, w)[0, ..., 0]
        else:
            m = crop(mask, h, w)
        return content_c, style_c, m
    return content_c, style_c
