"""Simple effects: grayscale and Reinhard color-palette transfer.

Both are pure device functions over NHWC float images; effect wrappers
keep the reference's composition contracts (app.py:157-159, 592-658).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tbist_tpu.ops import colorspace


@jax.jit
def grayscale(image: jnp.ndarray) -> jnp.ndarray:
    """PIL convert('L') parity, kept 3-channel for downstream effects."""
    return colorspace.rgb_to_grayscale(image, keep_rgb=True)


@jax.jit
def color_palette_transfer(
    source: jnp.ndarray, target: jnp.ndarray
) -> jnp.ndarray:
    """Transfer color statistics of ``target`` onto ``source`` (both NHWC)."""
    return colorspace.reinhard_color_transfer(source, target)
