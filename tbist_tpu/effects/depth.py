"""Depth-based style transfer: MIP layering and depth-loss variants.

Reference: components/style_transfer_depth/style_transfer_depth.py (DepthStyle)
and Style_a3.py. Differences by design:

* ``mip``: the n depth-bin layers are stylized with decreasing strength
  (1 - i/n, reference :61-72) — here as one batched run over the layer
  axis where strengths share a config, else pipelined sequential runs;
  reconstruction accumulates in float (no uint8 overflow, SURVEY §2.2/7).
* ``depth_loss``: the reference's depth loss has NO gradient path (PIL
  round-trip each closure, Style_a3.py:144-146) and re-runs the depth net
  every closure. Here the depth net stays in-graph (differentiable) when a
  real depth model is available; with the fallback estimator the depth
  term uses the same luminance proxy in-graph.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tbist_tpu.effects import style as style_fx
from tbist_tpu.ops import mip as mip_ops
from tbist_tpu.utils.config import DepthConfig, GatysConfig
from tbist_tpu.utils.logging import RunMetrics, logger


def _fallback_depth(image: jnp.ndarray) -> jnp.ndarray:
    """Deterministic pseudo-depth (smoothed luminance) when no Depth-Anything
    weights exist. Shape (H, W) float in [0, 1]."""
    from tbist_tpu.ops.filters import gaussian_blur

    img = image if image.ndim == 4 else image[None]
    luma = jnp.mean(img, axis=-1, keepdims=True)
    smooth = gaussian_blur(luma, 31)[0, ..., 0]
    return mip_ops.normalize_depth(smooth)


@functools.lru_cache(maxsize=1)
def default_depth_estimator() -> Callable:
    try:
        from tbist_tpu.models import depth_anything

        return depth_anything.get_depth_estimator()
    except Exception:
        from tbist_tpu.utils import degraded

        degraded.mark("depth_estimator", "depth_fallback")
        logger.warning(
            "depth estimator: no Depth-Anything weights — using smoothed-"
            "luminance pseudo-depth fallback"
        )
        return _fallback_depth


def depth_style_transfer(
    image: jnp.ndarray,
    style: jnp.ndarray,
    dcfg: DepthConfig,
    gcfg: GatysConfig,
    depth_estimator: Optional[Callable] = None,
    vgg_params=None,
    metrics: Optional[RunMetrics] = None,
) -> jnp.ndarray:
    depth_estimator = depth_estimator or default_depth_estimator()
    if dcfg.mode == "mip":
        return style_mip(
            image, style, dcfg.mip_layers, gcfg, depth_estimator, vgg_params, metrics
        )
    return style_depth_loss(image, style, dcfg, gcfg, depth_estimator, vgg_params, metrics)


def style_mip(
    image: jnp.ndarray,
    style: jnp.ndarray,
    n: int,
    gcfg: GatysConfig,
    depth_estimator: Callable,
    vgg_params=None,
    metrics: Optional[RunMetrics] = None,
    batched: Optional[bool] = None,
) -> jnp.ndarray:
    """Multi-plane-image stylization (style_transfer_depth.py:74-90).

    The reference runs a FULL 400-step optimization per depth layer,
    sequentially (n x latency, SURVEY §3.4). Two execution plans:

    * ``batched`` — all n layers as ONE dp-batched optimization whose
      per-layer strengths 1-i/n enter as a traced (n,) weight vector. On
      a multi-chip mesh the layers shard over dp, so n layers cost ~one
      layer's wall-clock. This is where batching pays.
    * sequential — n runs sharing one compiled program (strengths are
      traced). On a SINGLE chip this measured >= the batched plan at the
      real operating points even after the round-3h batch-first L-BFGS
      (batched is 0.85-0.95x at n=2/4, 256/512px — the single-frame
      gatys loop is simply more efficient per frame, 11.0 vs 13.3
      ms/step at 512px), so it is the single-device default.

    ``batched=None`` picks automatically: batched iff a production mesh
    exists (>1 device). Both plans are 1-step parity-tested.
    """
    import time

    from tbist_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.production_mesh(dp_only=True)
    if batched is None:
        batched = mesh is not None

    depth = depth_estimator(image)
    layers = mip_ops.generate_layers(image, depth, n)  # (n, H, W, C)
    strengths = [1.0 - i / n for i in range(n)]
    if not batched:
        stylized = []
        for i in range(n):
            out = style_fx.style_transfer(
                layers[i][None], [style], gcfg, vgg_params,
                strength=strengths[i], metrics=metrics,
            )
            stylized.append(out[0])
        final = mip_ops.reconstruct(jnp.stack(stylized), depth, n)
        return final[None]

    from tbist_tpu.optimize import gatys as gatys_lib
    from tbist_tpu.parallel import batched as batched_lib

    if vgg_params is None:
        from tbist_tpu.weights import vgg as vgg_weights

        vgg_params = vgg_weights.get_params()
    # same rule as the sequential wrapper (style.style_transfer): strength
    # 1.0 keeps cfg.w_style; other strengths map through the reference's
    # exponential curve (Style_a3.py:184-188)
    w_style = jnp.asarray(
        [
            gcfg.w_style if s == 1.0 else gatys_lib.style_weight_from_strength(s)
            for s in strengths
        ],
        jnp.float32,
    )
    layers_b = style_fx._bucket(layers, gcfg)
    style_b = style_fx._bucket(style, gcfg)
    if mesh is not None:
        # shard the n layers over dp; pad to a dp multiple (extra rows are
        # repeats whose results are sliced off)
        dp = mesh.shape[mesh_lib.DP_AXIS]
        layers_b, pad = mesh_lib.pad_to_multiple(layers_b, dp)
        if pad:
            w_style, _ = mesh_lib.pad_to_multiple(w_style, dp)
        layers_b = jax.device_put(layers_b, mesh_lib.batch_sharding(mesh))
        vgg_params = jax.device_put(vgg_params, mesh_lib.replicated(mesh))
        style_b = jax.device_put(style_b, mesh_lib.replicated(mesh))
    t0 = time.perf_counter()
    stylized = batched_lib.run(gcfg, vgg_params, layers_b, (style_b,), w_style=w_style)
    if mesh is not None and stylized.shape[0] != n:
        stylized = stylized[:n]
    # sync on a SCALAR: fetching the full stack through the ~31 MB/s axon
    # tunnel would add ~400 ms inside the timed region (CLAUDE.md rule)
    jax.device_get(stylized[0, 0, 0, 0])
    if metrics is not None:
        metrics.timings_s["mip_batched"] = time.perf_counter() - t0
    if stylized.shape[1:] != layers.shape[1:]:
        stylized = jax.image.resize(stylized, layers.shape, "bilinear")
    final = mip_ops.reconstruct(stylized, depth, n)
    return final[None]


def style_depth_loss(
    image: jnp.ndarray,
    style: jnp.ndarray,
    dcfg: DepthConfig,
    gcfg: GatysConfig,
    depth_estimator: Callable,
    vgg_params=None,
    metrics: Optional[RunMetrics] = None,
) -> jnp.ndarray:
    """Depth-aware stylization: Gatys + w_depth * MSE(depth(x), depth(content)).

    The reference enables w_depth=5e4 (Style_a3.py:181). Its implementation
    is inert in backward; ours keeps the depth function in-graph.
    """
    gcfg = dataclasses.replace(gcfg, w_depth=dcfg.w_depth)
    from tbist_tpu.optimize import gatys_depth

    image_b = style_fx._bucket(image, gcfg)
    style_b = style_fx._bucket(style, gcfg)
    out = gatys_depth.stylize_with_depth(
        image_b, style_b, gcfg, depth_estimator, vgg_params, metrics=metrics
    )
    if out.shape != image.shape:
        out = jax.image.resize(out, image.shape, "bilinear")
    return out
