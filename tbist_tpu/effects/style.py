"""Gatys style transfer / style mixing effect wrappers.

These own the host↔device boundary for the optimization effects: shape
bucketing, weight resolution and metrics. Reference orchestration:
app.py:372-590 (single style + mixing), Style_a3.py (strength variant).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from tbist_tpu.optimize import gatys
from tbist_tpu.utils.config import GatysConfig
from tbist_tpu.utils.imageio import bucket_shape
from tbist_tpu.utils.logging import RunMetrics, logger
from tbist_tpu.weights import vgg as vgg_weights


def _bucket(img: jnp.ndarray, cfg: GatysConfig) -> jnp.ndarray:
    h, w = img.shape[1], img.shape[2]
    bh, bw = bucket_shape(h, w, cfg.shape_bucket, cfg.max_side)
    if (bh, bw) != (h, w):
        img = jax.image.resize(img, (img.shape[0], bh, bw, img.shape[3]), "bilinear")
    return img


def style_transfer(
    content: jnp.ndarray,
    styles: Sequence[jnp.ndarray],
    cfg: Optional[GatysConfig] = None,
    vgg_params=None,
    strength: float = 1.0,
    metrics: Optional[RunMetrics] = None,
) -> jnp.ndarray:
    """Optimize ``content`` toward the style(s). NHWC [0,1] in and out.

    ``strength`` maps to w_style via the reference's exponential curve when
    it differs from 1 (Style_a3.py:184-188). Two styles → mixing with
    ``cfg.style_img_weight``.
    """
    cfg = cfg or GatysConfig()
    if strength != 1.0:
        cfg = dataclasses.replace(cfg, w_style=gatys.style_weight_from_strength(strength))
    if vgg_params is None:
        vgg_params = vgg_weights.get_params()

    content_b = _bucket(content, cfg)
    styles_b = tuple(_bucket(s, cfg) for s in styles)

    t0 = time.perf_counter()
    out, hist = gatys.stylize(content_b, styles_b, cfg, vgg_params)
    hist = jax.device_get(hist)  # forces completion (axon block_until_ready
    # alone can return early on the tunneled platform)
    dt = time.perf_counter() - t0
    logger.info(
        "gatys: %d iters in %.2fs (%.1f iters/s) @ %dx%d",
        cfg.num_steps,
        dt,
        cfg.num_steps / dt,
        content_b.shape[1],
        content_b.shape[2],
    )
    if metrics is not None:
        metrics.timings_s["gatys"] = dt
        metrics.loss_history = [float(x) for x in hist]
        metrics.extra["iters_per_sec"] = cfg.num_steps / dt

    if out.shape != content.shape:  # return at the caller's resolution
        out = jax.image.resize(out, content.shape, "bilinear")
    return out
