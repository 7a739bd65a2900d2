"""Public API: ``apply_image`` / ``apply_video`` over ``EffectRequest``.

Replaces the reference's 25-positional-argument entry points
(app.py:116-120, 742-746) with one typed aggregate. Host I/O (PIL, file
paths) happens here; everything past this boundary is device arrays.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np
from PIL import Image

from tbist_tpu.compose.pipeline import EffectInputs, ModelRegistry, apply_image as _apply
from tbist_tpu.utils.config import (  # re-export for users
    ColorPaletteConfig,
    DepthConfig,
    EffectRequest,
    GatysConfig,
    MaskCompositeConfig,
    PixelArtConfig,
    TextEffectConfig,
    VideoConfig,
)
from tbist_tpu.utils.imageio import from_device, load_image, to_device
from tbist_tpu.utils.logging import RunMetrics

ImageLike = Union[str, Image.Image, np.ndarray, jnp.ndarray]

__all__ = [
    "EffectRequest", "EffectInputs", "ModelRegistry", "RunMetrics",
    "GatysConfig", "TextEffectConfig", "PixelArtConfig", "ColorPaletteConfig",
    "DepthConfig", "MaskCompositeConfig", "VideoConfig",
    "apply_image", "apply_video",
]


def _as_device(img: Optional[ImageLike]) -> Optional[jnp.ndarray]:
    if img is None:
        return None
    if isinstance(img, jnp.ndarray):
        return img if img.ndim == 4 else img[None]
    if isinstance(img, str):
        img = load_image(img)
    return to_device(img)


def apply_image(
    image: Optional[ImageLike],
    request: EffectRequest,
    style_image: Optional[ImageLike] = None,
    style_image1: Optional[ImageLike] = None,
    style_image2: Optional[ImageLike] = None,
    color_palette_image: Optional[ImageLike] = None,
    pixel_palette_image: Optional[ImageLike] = None,
    registry: Optional[ModelRegistry] = None,
    metrics: Optional[RunMetrics] = None,
) -> Optional[Image.Image]:
    """Run the effect chain; returns a PIL image or None on invalid input."""
    x = _as_device(image)
    if x is None:
        # texture-mask-only works without an input image: return the emoji
        # stencil visualization (reference app.py:252-263)
        t = request.text
        if (
            t is not None
            and t.texture_prompt
            and not t.style_prompt
            and not t.location_prompt
        ):
            import jax.numpy as jnp

            from tbist_tpu.compose.pipeline import ModelRegistry

            reg = (registry or ModelRegistry()).ensure("emoji_extractor")
            mask = reg.emoji_extractor(t.texture_prompt)
            if metrics is not None:
                from tbist_tpu.utils import degraded as _degraded

                flags = _degraded.flags_for(
                    n for n in ("emoji_extractor",)
                    if n in reg.resolved_by_loader
                )
                if flags:
                    metrics.degraded = sorted(
                        set(metrics.degraded) | set(flags)
                    )
            return from_device(
                jnp.repeat(mask.astype(jnp.float32)[None, ..., None], 3, -1)
            )
        return None
    inputs = EffectInputs(
        style_image=_as_device(style_image),
        style_image1=_as_device(style_image1),
        style_image2=_as_device(style_image2),
        color_palette_image=_as_device(color_palette_image),
        pixel_palette_image=_as_device(pixel_palette_image),
    )
    out = _apply(x, request, inputs, registry, metrics)
    if out is None:
        return None
    return from_device(out)


def apply_video(
    video_path: Optional[str],
    request: EffectRequest,
    style_image: Optional[ImageLike] = None,
    style_image1: Optional[ImageLike] = None,
    style_image2: Optional[ImageLike] = None,
    color_palette_image: Optional[ImageLike] = None,
    pixel_palette_image: Optional[ImageLike] = None,
    registry: Optional[ModelRegistry] = None,
    out_path: Optional[str] = None,
    max_frames: Optional[int] = None,
    metrics: Optional[RunMetrics] = None,
) -> Optional[str]:
    """Process a video; returns the output mp4 path or None."""
    from tbist_tpu.video.video import apply_video as _apply_video

    inputs = EffectInputs(
        style_image=_as_device(style_image),
        style_image1=_as_device(style_image1),
        style_image2=_as_device(style_image2),
        color_palette_image=_as_device(color_palette_image),
        pixel_palette_image=_as_device(pixel_palette_image),
    )
    return _apply_video(
        video_path, request, inputs, registry, out_path, max_frames, metrics
    )
