"""Pixel art effect (reference components/pixel_art/pixel_art.py).

Pipeline parity: optional palette quantization (over a rendered 256-wide
palette strip) → NEAREST down/up pixelation → optional Canny edges from
the small image, NEAREST-upscaled and overlaid black. All steps are one
jitted device function; palettes come from the bundled JSON, from an
image via k-means, or from a caller-supplied array.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tbist_tpu.ops import canny as canny_ops
from tbist_tpu.ops import palette as palette_ops
from tbist_tpu.ops import resize
from tbist_tpu.utils.config import PixelArtConfig

_PALETTE_JSON = os.path.join(os.path.dirname(__file__), "data", "palettes.json")


@functools.lru_cache(maxsize=1)
def load_palette_list():
    """70 hex palettes (5-13 colors each), parity with the reference's 100.json."""
    with open(_PALETTE_JSON) as f:
        return json.load(f)


def hex_to_rgb(hex_color: str) -> Tuple[int, int, int]:
    h = hex_color.lstrip("#")
    return tuple(int(h[i : i + 2], 16) for i in (0, 2, 4))


def get_palette(number: int) -> np.ndarray:
    return np.array([hex_to_rgb(c) for c in load_palette_list()[number]], np.uint8)


def palette_strip(palette: np.ndarray, interpolate: bool = False) -> np.ndarray:
    """(P, 3) palette -> (256, 3) quantizer colors, as the reference builds
    from ``display_palette((1, 256))`` (pixel_art.py:41-44)."""
    return palette_ops.render_palette_strip(palette, (1, 256), interpolate).reshape(-1, 3)


@functools.partial(
    jax.jit,
    static_argnames=("pixel_size", "edge_detect", "edge_threshold", "use_palette"),
)
def _pixel_art_jit(
    image: jnp.ndarray,
    strip: jnp.ndarray,
    pixel_size: float,
    use_palette: bool,
    edge_detect: bool,
    edge_threshold: int,
) -> jnp.ndarray:
    """image: (B, H, W, 3) float [0,1]; strip: (256, 3) uint8-valued floats.

    Per-IMAGE semantics over the batch (quantization and pixelation are
    per-pixel; Canny runs vmapped per frame), so the video lane can send a
    whole frame chunk through one compiled program."""
    h, w = image.shape[1], image.shape[2]
    img = image * 255.0

    if use_palette:
        img = palette_ops.quantize_to_palette(img, strip)

    ps = max(pixel_size, 0.0001)
    small_h, small_w = max(int(h * ps), 1), max(int(w * ps), 1)
    small = resize.resize_nearest(img, (small_h, small_w))
    big = resize.resize_nearest(small, (h, w))

    if edge_detect:
        low = canny_ops.remap_threshold(edge_threshold)
        gray = small @ jnp.asarray([0.299, 0.587, 0.114], jnp.float32)
        edges = jax.vmap(lambda g: canny_ops.canny(g, low, low * 2.0))(gray)
        edges_big = resize.resize_nearest(edges[..., None], (h, w))[..., 0]
        big = jnp.where(edges_big[..., None] > 0, 0.0, big)

    return jnp.clip(big / 255.0, 0.0, 1.0)


def pixel_art(
    image: jnp.ndarray,
    cfg: PixelArtConfig,
    palette: Optional[np.ndarray] = None,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Apply pixel art to an NHWC image in [0, 1].

    ``palette`` overrides cfg palette selection (e.g. one extracted from an
    image). The edge-detect toggle follows the reference: a 0 slider
    disables edges even when requested (app.py:295-300).
    """
    use_palette = cfg.use_palette or palette is not None
    if use_palette and palette is None:
        if cfg.palette_from_image:
            if key is None:
                key = jax.random.key(0)
            palette = palette_ops.palette_from_image(
                np.asarray(image[0]), cfg.palette_num_colors, key
            )
        else:
            palette = get_palette(cfg.palette_number)
    if use_palette:
        strip = jnp.asarray(
            palette_strip(np.asarray(palette), cfg.interpolate), jnp.float32
        )
    else:
        strip = jnp.zeros((256, 3), jnp.float32)

    edge_detect = cfg.edge_detect and cfg.edge_threshold != 0
    return _pixel_art_jit(
        image,
        strip,
        float(cfg.pixel_size),
        bool(use_palette),
        bool(edge_detect),
        int(cfg.edge_threshold),
    )
