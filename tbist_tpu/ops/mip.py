"""Multi-plane-image depth binning (reference components/style_transfer_depth/util.py:9-86).

Pure jnp; the whole layer stack is produced as one (N, H, W, C) tensor so
the per-layer stylization can ``vmap``/pipeline over it. Accumulation is in
float — the reference's ``uint8 +=`` overflow on shared bin-boundary pixels
(util.py:83-85, SURVEY §2.2 item 7) is fixed by construction.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def normalize_depth(depth: jnp.ndarray) -> jnp.ndarray:
    """Min-max normalize a (H, W) depth map to [0, 1]."""
    dmin, dmax = jnp.min(depth), jnp.max(depth)
    return (depth - dmin) / jnp.maximum(dmax - dmin, 1e-12)


def create_bins(n: int) -> np.ndarray:
    """(n, 2) array of [min, max] equal-width bin edges (util.py:38-50)."""
    edges = np.linspace(0.0, 1.0, n + 1)
    return np.stack([edges[:-1], edges[1:]], axis=1)


def bin_masks(depth: jnp.ndarray, n: int) -> jnp.ndarray:
    """(n, H, W) float masks; mask i is 1 where depth falls in bin i.

    Bin edges are inclusive on both sides (reference mask_image_depth,
    util.py:31), so boundary pixels belong to two bins — reconstruction
    clips instead of overflowing.
    """
    d = normalize_depth(depth)
    bins = create_bins(n)
    lo = jnp.asarray(bins[:, 0])[:, None, None]
    hi = jnp.asarray(bins[:, 1])[:, None, None]
    return ((d[None] >= lo) & (d[None] <= hi)).astype(jnp.float32)


def generate_layers(image: jnp.ndarray, depth: jnp.ndarray, n: int) -> jnp.ndarray:
    """NHWC image + (H, W) depth -> (n, H, W, C) depth-masked layer images."""
    masks = bin_masks(depth, n)  # (n, H, W)
    img = image[0] if image.ndim == 4 else image
    return img[None] * masks[..., None]


def reconstruct(
    stylized_layers: jnp.ndarray, depth: jnp.ndarray, n: int
) -> jnp.ndarray:
    """Re-mask stylized layers by their bins and sum -> (H, W, C) in [0, 1]."""
    masks = bin_masks(depth, n)
    acc = jnp.sum(stylized_layers * masks[..., None], axis=0)
    return jnp.clip(acc, 0.0, 1.0)
