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


def sp_min_width() -> int:
    """Width threshold for spatially sharding the single-image Gatys
    optimization over the sp axis. The Gatys step is VGG forward+backward
    (~100x the per-pixel work of feed-forward Ghiasi), so the halo
    exchanges amortize at much smaller widths than text_transfer's
    1024 default: the compiled-HLO halo accounting (benchmarks/PROFILE.md
    round-5a) puts the per-step ICI traffic at ~3% of the step's HBM
    traffic at 512px on 2 chips. Only one real chip is reachable here, so
    the crossover is validated functionally (virtual 8-device mesh,
    loss-trajectory parity in dryrun_multichip) and sized analytically.
    ``TBIST_GATYS_SP_MIN_WIDTH`` overrides."""
    import os

    return int(os.environ.get("TBIST_GATYS_SP_MIN_WIDTH", "512"))


def _sp_mesh(content_b: jnp.ndarray, cfg: GatysConfig) -> object:
    """The sp-only production mesh when the single-image optimization can
    shard its width axis, else None.

    Gated to configs whose semantics the batched lane shares: SE channel
    attention and random init stay on the per-image ``optimize.gatys``
    program (they have no batched counterpart; checkpoint resume already
    calls ``gatys.stylize`` directly, optimize/checkpoint.py)."""
    if cfg.channel_attention or cfg.random_init:
        return None
    if content_b.shape[0] != 1 or content_b.shape[2] < sp_min_width():
        return None
    from tbist_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.production_mesh(sp_only=True)
    if mesh is None:
        return None
    # width must tile evenly over sp (buckets are multiples of 32, so any
    # 2/4/8-way slice divides; skip odd remainders rather than pad — GSPMD
    # padding would bias the gram/instance statistics)
    if content_b.shape[2] % mesh.shape[mesh_lib.SP_AXIS] != 0:
        return None
    return mesh


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
    mesh = _sp_mesh(content_b, cfg)
    if mesh is not None:
        # Multi-chip lane (r4 VERDICT #1): shard the image's WIDTH over the
        # sp-only production mesh and run the batched-lane program (the
        # exact loop dryrun_multichip proves sharded-correct) — XLA GSPMD
        # splits every VGG conv fwd+bwd spatially with automatic halo
        # exchange and psums the gram/loss reductions, so the heaviest
        # public endpoint (reference run_style_transfer.py:100-151 on ONE
        # device, app.py:51) scales across a slice. Loss weights ride
        # traced so strength sweeps share one compiled program.
        import dataclasses as _dc

        from tbist_tpu.parallel import batched, mesh as mesh_lib

        w_vec = jnp.full((1,), cfg.w_style, jnp.float32)
        cfg_static = _dc.replace(cfg, w_style=float(cfg.w_style > 0))
        content_s = jax.device_put(content_b, mesh_lib.single_image_sharding(mesh))
        vgg_sharded = jax.device_put(vgg_params, mesh_lib.replicated(mesh))
        styles_s = tuple(
            jax.device_put(s, mesh_lib.replicated(mesh)) for s in styles_b
        )
        out, hist = batched.run(
            cfg_static, vgg_sharded, content_s, styles_s, w_vec,
            return_history=True,
        )
        hist = jax.device_get(hist)[:, 0]
        logger.info(
            "gatys: single image width sharded %d-way (sp)",
            mesh.shape[mesh_lib.SP_AXIS],
        )
    else:
        out, hist = gatys.stylize(content_b, styles_b, cfg, vgg_params)
        hist = jax.device_get(hist)  # forces completion (axon
        # block_until_ready alone can return early on the tunneled platform)
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
