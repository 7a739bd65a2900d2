"""Palette quantization and k-means color reduction, on device.

Reference: components/pixel_art/pixel_art.py:76-89 quantizes via a sklearn
KDTree nearest-neighbor lookup over a 256-wide rendered palette strip, and
components/pixel_art/util.py:16-32 extracts palettes with cv2.kmeans.

TPU-native equivalents: nearest-palette is a brute-force argmin over the
palette axis (a (H*W, P) distance matrix — one MXU-friendly matmul
expansion, far faster than any tree on this hardware), and k-means is a
fixed-iteration Lloyd loop under ``lax.fori_loop`` with explicit PRNG
(the reference's cv2 KMEANS_RANDOM_CENTERS is unseeded; ours is
deterministic by key).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_to_palette(img: jnp.ndarray, palette: jnp.ndarray) -> jnp.ndarray:
    """Map each pixel of (..., 3) ``img`` to its nearest ``palette`` entry.

    L2 metric, ties to the lowest index (matching KDTree). ``palette`` is
    (P, 3). Distances expand to ||x||² - 2x·p + ||p||²; the cross term is a
    single matmul on the MXU.
    """
    shape = img.shape
    flat = img.reshape(-1, 3).astype(jnp.float32)
    pal = palette.astype(jnp.float32)
    cross = jnp.matmul(flat, pal.T, precision=jax.lax.Precision.HIGHEST)  # (N, P) — MXU
    d2 = jnp.sum(pal * pal, axis=1)[None, :] - 2.0 * cross
    idx = jnp.argmin(d2, axis=1)
    return pal[idx].reshape(shape)


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(
    pixels: jnp.ndarray, k: int, key: jax.Array, iters: int = 10
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lloyd k-means over (N, 3) pixels -> (centers (k, 3), labels (N,)).

    Fixed iteration count (the reference uses 10 cv2 iterations,
    util.py:29-30); empty clusters keep their previous center.
    """
    n = pixels.shape[0]
    x = pixels.astype(jnp.float32)
    init_idx = jax.random.choice(key, n, (k,), replace=False)
    centers0 = x[init_idx]

    def assign(centers):
        d2 = (
            jnp.sum(x * x, axis=1)[:, None]
            - 2.0 * jnp.matmul(x, centers.T, precision=jax.lax.Precision.HIGHEST)
            + jnp.sum(centers * centers, axis=1)[None, :]
        )
        return jnp.argmin(d2, axis=1)

    def body(_, centers):
        labels = assign(centers)
        one_hot = jax.nn.one_hot(labels, k, dtype=jnp.float32)  # (N, k)
        counts = jnp.sum(one_hot, axis=0)  # (k,)
        sums = one_hot.T @ x  # (k, 3) — MXU
        new_centers = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where(counts[:, None] > 0, new_centers, centers)

    centers = jax.lax.fori_loop(0, iters, body, centers0)
    return centers, assign(centers)


def palette_from_image(
    img: jnp.ndarray, num_colors: int, key: jax.Array
) -> np.ndarray:
    """k-means color extraction -> sorted unique uint8 centers (host array).

    Matches ColourPalette.set_palette_from_image (colour_palette.py:53-64):
    the palette is the sorted unique set of quantized pixel values.
    ``num_colors`` clamps to >=1: the reference UI slider allows 0, which
    crashes its cv2.kmeans (intended divergence, PARITY.md).
    """
    num_colors = max(1, int(num_colors))
    flat = (img.reshape(-1, 3) * 255.0) if img.dtype.kind == "f" else img.reshape(-1, 3)
    centers, labels = kmeans(jnp.asarray(flat, jnp.float32), num_colors, key)
    quantized = np.asarray(centers, dtype=np.float32)[np.asarray(labels)]
    quantized = np.clip(np.round(quantized), 0, 255).astype(np.uint8)
    return np.sort(np.unique(quantized, axis=0), axis=0)


def render_palette_strip(
    palette: np.ndarray, size: Tuple[int, int], interpolate: bool = False
) -> np.ndarray:
    """Render a palette as an (H, W, 3) uint8 strip (host, for UI + quantizer).

    Matches ColourPalette._create_image (colour_palette.py:67-97): equal
    color blocks, or per-pair ``np.linspace`` gradients when interpolating;
    trailing columns beyond ``blocks * n`` stay black.
    """
    h, w = size
    n = len(palette)
    blocks = w // (n - 1 if interpolate and n > 1 else n)
    out = np.zeros((h, w, 3), dtype=np.uint8)
    if interpolate and n > 1:
        for i in range(n - 1):
            r = np.linspace(palette[i][0], palette[i + 1][0], blocks, dtype=np.uint8)
            g = np.linspace(palette[i][1], palette[i + 1][1], blocks, dtype=np.uint8)
            b = np.linspace(palette[i][2], palette[i + 1][2], blocks, dtype=np.uint8)
            out[:, i * blocks : (i + 1) * blocks] = np.stack([r, g, b], axis=-1)
    else:
        for i in range(n):
            out[:, i * blocks : (i + 1) * blocks] = palette[i]
    return out
