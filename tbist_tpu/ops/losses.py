"""Style-transfer losses as pure jnp functions (NHWC layout).

Semantics match the reference losses (multi_style_transfer/
style_transfer_losses.py:9-225) but are re-expressed for TPU:

* NHWC instead of NCHW — the natural conv layout on TPU.
* Gram matrices are plain MXU matmuls with fp32 accumulation.
* Everything is differentiable and jit/vmap-compatible; no dicts of
  tensors mutate in place.

Feature pytrees are ``{layer_name: (B, H, W, C) array}``.
"""

from __future__ import annotations

import os
from typing import Mapping, Sequence

import jax.numpy as jnp

Features = Mapping[str, jnp.ndarray]


def normalize(img: jnp.ndarray, mean, std) -> jnp.ndarray:
    """Channel-wise z-normalization of an NHWC image.

    Reference: style_transfer_losses.py:9-28 (NCHW there).
    """
    mean = jnp.asarray(mean, img.dtype).reshape(1, 1, 1, -1)
    std = jnp.asarray(std, img.dtype).reshape(1, 1, 1, -1)
    return (img - mean) / std


def content_loss(
    input_features: Features,
    content_features: Features,
    content_layers: Sequence[str],
) -> jnp.ndarray:
    """Mean-squared error between feature maps, averaged over layers.

    Reference: style_transfer_losses.py:31-67.
    """
    loss = 0.0
    for layer in content_layers:
        x = input_features[layer].astype(jnp.float32)
        y = content_features[layer].astype(jnp.float32)
        loss = loss + jnp.mean(jnp.square(x - y))
    return loss / len(content_layers)


# Measured on v5e: XLA fuses the gram einsum into the surrounding loss
# graph better than the standalone Pallas kernel (56 vs 43 iters/s on the
# full 512px Gatys loop), so the kernel is opt-in (TBIST_PALLAS_GRAM=1).
_USE_PALLAS_GRAM = os.environ.get("TBIST_PALLAS_GRAM", "0") == "1"


def gram_matrix(x: jnp.ndarray) -> jnp.ndarray:
    """Normalized Gram matrix of NHWC features -> (B, C, C).

    Matches the reference normalization by ``b*c*h*w``
    (style_transfer_losses.py:70-95). Default path is a single MXU einsum
    with fp32 accumulation — XLA fuses it into the surrounding loss graph
    better than the standalone Pallas kernel (see benchmark note above).
    Set ``TBIST_PALLAS_GRAM=1`` to opt in to the Pallas kernel
    (ops.pallas_gram: tiled VMEM accumulation + fused normalization +
    analytic VJP) on lane-aligned channel counts.
    """
    if _USE_PALLAS_GRAM:
        from tbist_tpu.ops import pallas_gram

        if pallas_gram.supported(x):
            return pallas_gram.gram_matrix(x)
    b, h, w, c = x.shape
    # contract h, w directly on the 4D array — reshaping to (B, H*W, C)
    # first makes XLA emit a real layout-conversion kernel per layer
    g = jnp.einsum(
        "bhwc,bhwd->bcd", x, x, preferred_element_type=jnp.float32
    )
    return g / (b * c * h * w)


def style_loss(
    input_features: Features,
    style_features: Sequence[Features],
    style_layers: Sequence[str],
    style_img_weight: float = 0.5,
    exact_reference_mixer: bool = False,
) -> jnp.ndarray:
    """Gram-MSE style loss, averaged over layers, with 2-style mixing.

    Reference: style_transfer_losses.py:98-146. With two style feature sets
    the per-layer features are fused by ``mix_features`` before the Gram
    (reference StyleMixer.py:25-38).
    """
    from tbist_tpu.ops.mixing import mix_features

    loss = 0.0
    for layer in style_layers:
        g_in = gram_matrix(input_features[layer])
        if len(style_features) == 1:
            g_style = gram_matrix(style_features[0][layer])
        else:
            mixed = mix_features(
                style_features[0][layer],
                style_features[1][layer],
                style_img_weight,
                exact_reference=exact_reference_mixer,
            )
            g_style = gram_matrix(mixed)
        loss = loss + jnp.mean(jnp.square(g_in - g_style))
    return loss / len(style_layers)


def total_variation_loss(y: jnp.ndarray) -> jnp.ndarray:
    """Anisotropic TV normalized by C*H*W (style_transfer_losses.py:149-174)."""
    _, h, w, c = y.shape
    dh = jnp.sum(jnp.abs(y[:, 1:, :, :] - y[:, :-1, :, :]))
    dw = jnp.sum(jnp.abs(y[:, :, 1:, :] - y[:, :, :-1, :]))
    return (dh + dw) / (c * h * w)


def to_grayscale(img: jnp.ndarray) -> jnp.ndarray:
    """Channel mean, NHWC -> (B, H, W, 1) (helper_functions.py:104-113)."""
    return jnp.mean(img, axis=-1, keepdims=True)


def gradient_images(img: jnp.ndarray) -> jnp.ndarray:
    """Central-difference gradient images of a grayscale NHWC image.

    Output (B, H-2, W-2, 2): channel 0 is d/dx, channel 1 is d/dy —
    matching the reference's "sobel" that is actually central differences
    (style_transfer_losses.py:177-204).
    """
    dx = img[:, 1:-1, 2:, 0] - img[:, 1:-1, :-2, 0]
    dy = img[:, 2:, 1:-1, 0] - img[:, :-2, 1:-1, 0]
    return jnp.stack([dx, dy], axis=-1)


def edge_loss(grad1: jnp.ndarray, grad2: jnp.ndarray) -> jnp.ndarray:
    """Mean of per-axis MSEs between gradient images (B, H, W, 2).

    Reference: style_transfer_losses.py:207-225.
    """
    mse_dx = jnp.mean(jnp.square(grad1[..., 0] - grad2[..., 0]))
    mse_dy = jnp.mean(jnp.square(grad1[..., 1] - grad2[..., 1]))
    return (mse_dx + mse_dy) / 2.0


def depth_loss(depth_optim: jnp.ndarray, depth_target: jnp.ndarray) -> jnp.ndarray:
    """MSE depth consistency loss.

    Reference: components/style_transfer_depth/util.py:335-348. Unlike the
    reference — whose depth loss round-trips through PIL and therefore has
    no gradient (Style_a3.py:144-146) — callers here keep the depth network
    in-graph so this term actually optimizes.
    """
    return jnp.mean(jnp.square(depth_optim - depth_target))
