"""Depth-aware Gatys optimization (reference Style_a3 depth path).

The reference's depth loss is inert: it re-renders the image to PIL and
re-runs the HF depth pipeline inside each closure, so no gradient flows
(Style_a3.py:142-146, SURVEY §2.2 item 4). Here the depth estimator is a
jax-traceable function kept *in-graph*, so the depth term both optimizes
and costs one fused forward per iteration instead of a host round-trip.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from tbist_tpu.models import vgg19
from tbist_tpu.ops import losses, mip as mip_ops
from tbist_tpu.optimize import lbfgs
from tbist_tpu.utils.config import VGG_MEAN, VGG_STD, GatysConfig
from tbist_tpu.utils.logging import RunMetrics


@functools.partial(jax.jit, static_argnames=("cfg", "depth_fn"))
def _stylize_depth_jit(
    cfg: GatysConfig,
    depth_fn: Callable,
    weights: jnp.ndarray,
    vgg_params,
    content: jnp.ndarray,
    style: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    compute_dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    mean = jnp.asarray(VGG_MEAN, jnp.float32)
    std = jnp.asarray(VGG_STD, jnp.float32)
    all_layers = tuple(dict.fromkeys(cfg.content_layers + cfg.style_layers))

    normed_content = losses.normalize(content, mean, std)
    content_feats = vgg19.extract_features(
        vgg_params, normed_content, all_layers, compute_dtype
    )
    style_feats = vgg19.extract_features(
        vgg_params, losses.normalize(style, mean, std), cfg.style_layers, compute_dtype
    )
    target_grad = losses.gradient_images(losses.to_grayscale(normed_content))
    target_depth = mip_ops.normalize_depth(depth_fn(content))

    def loss_fn(img):
        normed = losses.normalize(img, mean, std)
        feats = vgg19.extract_features(vgg_params, normed, all_layers, compute_dtype)
        loss = jnp.zeros((), jnp.float32)
        if cfg.w_content > 0:
            loss += weights[1] * losses.content_loss(
                feats, content_feats, cfg.content_layers
            )
        if cfg.w_style > 0:
            loss += weights[0] * losses.style_loss(
                feats, [style_feats], cfg.style_layers
            )
        if cfg.w_tv > 0:
            loss += weights[2] * losses.total_variation_loss(normed)
        if cfg.w_edge > 0:
            g = losses.gradient_images(losses.to_grayscale(img))
            loss += weights[3] * losses.edge_loss(target_grad, g)
        if cfg.w_depth > 0:
            d = mip_ops.normalize_depth(depth_fn(img))
            loss += weights[6] * losses.depth_loss(d, target_depth)
        return loss

    value_and_grad = jax.value_and_grad(loss_fn)
    img0 = content.astype(jnp.float32)
    opt_state0 = lbfgs.init_state(img0.shape, cfg.lbfgs_memory)
    hist0 = jnp.zeros((cfg.num_steps,), jnp.float32)

    def body(i, carry):
        img, opt_state, hist = carry
        img = jnp.clip(img, 0.0, 1.0)
        value, grad = value_and_grad(img)
        step_vec, opt_state = lbfgs.update(grad, opt_state, weights[5])
        return img + step_vec, opt_state, hist.at[i].set(value)

    img, _, hist = jax.lax.fori_loop(0, cfg.num_steps, body, (img0, opt_state0, hist0))
    return jnp.clip(img, 0.0, 1.0), hist


def stylize_with_depth(
    content: jnp.ndarray,
    style: jnp.ndarray,
    cfg: GatysConfig,
    depth_fn: Callable,
    vgg_params=None,
    metrics: Optional[RunMetrics] = None,
) -> jnp.ndarray:
    if vgg_params is None:
        from tbist_tpu.weights import vgg as vgg_weights

        vgg_params = vgg_weights.get_params()
    from tbist_tpu.optimize.gatys import _normalize_static, _weights_array

    weights = jnp.concatenate(
        [_weights_array(cfg), jnp.asarray([cfg.w_depth], jnp.float32)]
    )
    out, hist = _stylize_depth_jit(
        _normalize_static(cfg), depth_fn, weights, vgg_params,
        content.astype(jnp.float32), style.astype(jnp.float32),
    )
    if metrics is not None:
        metrics.loss_history = [float(x) for x in jax.device_get(hist)]
    return out
