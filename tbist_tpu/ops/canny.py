"""Canny edge detection in pure JAX (cv2-compatible semantics).

Reference: components/pixel_art/util.py:34-47 calls ``cv2.Canny`` with
L1-gradient / aperture-3 defaults on the grayscale of the pixelated image.

TPU-native implementation: Sobel-3 gradients (two small convs), 4-sector
non-maximum suppression as vectorized selects, double thresholding, and
hysteresis as iterated 3×3 max-pool propagation of strong edges through
weak pixels under ``lax.while_loop`` (converges in O(longest weak chain);
each step is a tiny fused reduce-window).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
_SOBEL_Y = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], np.float32)


def _conv2d_same(x: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """(H, W) replicate-padded 3x3 conv (cv2 BORDER_REFLECT_101)."""
    xp = jnp.pad(x, 1, mode="reflect")
    return jax.lax.conv_general_dilated(
        xp[None, ..., None],
        jnp.asarray(kernel)[..., None, None],
        (1, 1),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )[0, ..., 0]


def _dilate3(mask: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        mask, jnp.zeros((), mask.dtype), jax.lax.max, (3, 3), (1, 1), "SAME"
    )


def canny(
    gray: jnp.ndarray,
    low_threshold: float,
    high_threshold: float,
    max_hysteresis_iters: int = 64,
) -> jnp.ndarray:
    """(H, W) grayscale in [0, 255] -> float {0, 1} edge map.

    L1 gradient magnitude (cv2 default ``L2gradient=False``).
    """
    gx = _conv2d_same(gray.astype(jnp.float32), _SOBEL_X)
    gy = _conv2d_same(gray.astype(jnp.float32), _SOBEL_Y)
    mag = jnp.abs(gx) + jnp.abs(gy)

    # --- non-maximum suppression over 4 quantized directions ---
    # cv2 sector logic: compare |gy| against tan(22.5)|gx| and tan(67.5)|gx|
    ax, ay = jnp.abs(gx), jnp.abs(gy)
    tg22 = 0.4142135623730951
    tg67 = 2.414213562373095
    horiz = ay < tg22 * ax  # gradient mostly horizontal -> compare L/R
    vert = ay > tg67 * ax  # mostly vertical -> compare U/D
    diag_main = jnp.logical_and(~horiz, ~vert) & (jnp.sign(gx) == jnp.sign(gy))
    # pad magnitude for neighbor lookups
    mp = jnp.pad(mag, 1)
    c = mp[1:-1, 1:-1]
    left, right = mp[1:-1, :-2], mp[1:-1, 2:]
    up, down = mp[:-2, 1:-1], mp[2:, 1:-1]
    ul, lr = mp[:-2, :-2], mp[2:, 2:]
    ur, ll = mp[:-2, 2:], mp[2:, :-2]

    keep_h = (c > left) & (c >= right)
    keep_v = (c > up) & (c >= down)
    keep_d1 = (c > ul) & (c >= lr)  # 135° sector (same-signed gx, gy)
    keep_d2 = (c > ur) & (c >= ll)  # 45° sector
    keep = jnp.where(
        horiz, keep_h, jnp.where(vert, keep_v, jnp.where(diag_main, keep_d1, keep_d2))
    )
    nms = jnp.where(keep, mag, 0.0)

    strong = (nms > high_threshold).astype(jnp.float32)
    weak = (nms > low_threshold).astype(jnp.float32)

    # --- hysteresis: propagate strong through weak until fixpoint ---
    def cond(carry):
        cur, prev, i = carry
        return jnp.logical_and(i < max_hysteresis_iters, jnp.any(cur != prev))

    def body(carry):
        cur, _, i = carry
        grown = jnp.minimum(_dilate3(cur), weak)
        grown = jnp.maximum(grown, strong)
        return grown, cur, i + 1

    edges, _, _ = jax.lax.while_loop(
        cond, body, (strong, strong - 1.0, jnp.zeros((), jnp.int32))
    )
    return edges


def remap_threshold(value: float) -> float:
    """Edge slider 0-100 -> Canny low threshold 300-1.

    Intended behavior of components/pixel_art/util.py:63-83 ``re_map`` —
    a decreasing linear map clamped to [1, 300]. (The reference's clamp
    branches are inverted but inert for in-range sliders, so behavior
    coincides on 0-100 inputs.)
    """
    re = (value - 0.0) * (1.0 - 300.0) / (100.0 - 0.0) + 300.0
    return float(min(max(re, 1.0), 300.0))
