"""Separable filters: Gaussian blur (cv2-parity) and edge detection.

cv2.GaussianBlur(img, (k, k), 0) ≡ separable 1-D Gaussian with
sigma = 0.3*((k-1)*0.5 - 1) + 0.8 and BORDER_REFLECT_101 padding
(used for mask feathering at segmentation_style_transfer.py:84 and
emoji merge at emoji_segmentation_style_transfer.py:86). On TPU this is two
depthwise convs that XLA fuses with neighbors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel_1d(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """cv2.getGaussianKernel semantics (sigma<=0 derives sigma from ksize;
    cv2 additionally uses fixed binomial-ish tables for ksize<=7)."""
    if ksize % 2 != 1:
        ksize += 1  # reference forces odd kernels (…style_transfer.py:76-78)
    try:
        import cv2

        return cv2.getGaussianKernel(ksize, sigma).ravel().astype(np.float32)
    except ImportError:
        pass
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    xs = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2
    k = np.exp(-(xs**2) / (2.0 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(x: jnp.ndarray, ksize: int, sigma: float = 0.0) -> jnp.ndarray:
    """Separable Gaussian blur of an NHWC array with reflect-101 borders."""
    if ksize % 2 != 1:
        ksize += 1
    if ksize <= 1:
        return x
    k = jnp.asarray(gaussian_kernel_1d(ksize, sigma), x.dtype)
    pad = ksize // 2
    c = x.shape[-1]

    # reflect-101 (exclude edge) == np.pad 'reflect'
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)), mode="reflect")
    kern_h = jnp.tile(k.reshape(ksize, 1, 1, 1), (1, 1, 1, c))
    x1 = jax.lax.conv_general_dilated(
        xp,
        kern_h,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    xp = jnp.pad(x1, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    kern_w = jnp.tile(k.reshape(1, ksize, 1, 1), (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        xp,
        kern_w,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def blur_masks(masks: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Batched ``blur_mask``: (B, H, W) -> (B, H, W), per-frame identical
    (the separable blur convs are already batched over N)."""
    m = masks.astype(jnp.float32)[..., None]
    out = gaussian_blur(m, ksize)[..., 0]
    return jnp.round(jnp.clip(out, 0.0, 1.0) * 255.0) / 255.0


def blur_mask(mask: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Gaussian-feather a 2-D {0,1} mask -> float [0,1] (H, W).

    Matches the reference uint8 round-trip exactly: the mask is scaled to
    0/255, blurred as uint8, then divided by 255 (_edge_smoothing,
    segmentation_style_transfer.py:81-88; emoji merge :85-88). The
    quantization matters downstream — the emoji merge normalizes by
    per-window maxima, which amplifies sub-LSB differences — so we
    round to 8-bit steps on device (one fused op).
    """
    m = mask.astype(jnp.float32)[None, ..., None]
    out = gaussian_blur(m, ksize)[0, ..., 0]
    out = jnp.round(jnp.clip(out, 0.0, 1.0) * 255.0) / 255.0
    return out
