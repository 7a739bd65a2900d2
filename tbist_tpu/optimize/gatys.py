"""Gatys pixel-optimization style transfer — one jitted device program.

Reference: multi_style_transfer/run_style_transfer.py:27-159 (a Python
closure loop around torch LBFGS, one host↔device sync per closure) and
components/style_transfer_depth/Style_a3.py (the depth/strength variant).

TPU-first design: feature targets, the optimizer, the clamp and the loss
history all live inside a single ``lax.fori_loop`` under ``jax.jit`` —
zero host synchronization for the whole 400-iteration run. The config is a
frozen dataclass used as a static jit argument, so each (config, shape)
pair compiles exactly once.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from tbist_tpu.models import channel_attention, vgg19
from tbist_tpu.ops import losses
from tbist_tpu.optimize import lbfgs
from tbist_tpu.utils.config import VGG_MEAN, VGG_STD, GatysConfig


def style_weight_from_strength(strength: float) -> float:
    """Strength -> w_style mapping of the depth component (Style_a3.py:184-188)."""
    import math

    if strength < 0:
        return 5e5
    return 5e5 * math.e ** (strength - 1.0 / strength)


def _make_loss_fn(
    cfg: GatysConfig,
    weights: jnp.ndarray,
    vgg_params,
    content_feats,
    style_feats_list,
    target_grad,
    compute_dtype,
):
    """``cfg`` carries only structure here (which terms exist, layers);
    the actual loss weights are the traced ``weights`` array
    [w_style, w_content, w_tv, w_edge, style_img_weight] so sweeping
    strengths (e.g. per MIP layer) reuses one compiled program."""
    mean = jnp.asarray(VGG_MEAN, jnp.float32)
    std = jnp.asarray(VGG_STD, jnp.float32)
    all_layers = tuple(dict.fromkeys(cfg.content_layers + cfg.style_layers))

    def loss_fn(img: jnp.ndarray) -> jnp.ndarray:
        normed = losses.normalize(img, mean, std)
        feats = vgg19.extract_features(
            vgg_params, normed, all_layers, compute_dtype
        )
        loss = jnp.zeros((), jnp.float32)
        if cfg.w_content > 0:
            loss += weights[1] * losses.content_loss(
                feats, content_feats, cfg.content_layers
            )
        if cfg.w_style > 0:
            loss += weights[0] * losses.style_loss(
                feats,
                style_feats_list,
                cfg.style_layers,
                weights[4],
                cfg.exact_reference_mixer,
            )
        if cfg.w_tv > 0:
            loss += weights[2] * losses.total_variation_loss(normed)
        if cfg.w_edge > 0:
            grad_img = losses.gradient_images(losses.to_grayscale(img))
            loss += weights[3] * losses.edge_loss(target_grad, grad_img)
        return loss

    return loss_fn


def _normalize_static(cfg: GatysConfig) -> GatysConfig:
    """Collapse traced-able fields to canonical values for the jit key, so
    runs differing only in loss weights / seed share one compilation."""
    import dataclasses

    return dataclasses.replace(
        cfg,
        w_style=float(cfg.w_style > 0),
        w_content=float(cfg.w_content > 0),
        w_tv=float(cfg.w_tv > 0),
        w_edge=float(cfg.w_edge > 0),
        w_depth=float(cfg.w_depth > 0),
        style_img_weight=0.5,
        learning_rate=1.0,
        seed=0,
    )


def _weights_array(cfg: GatysConfig) -> jnp.ndarray:
    return jnp.asarray(
        [cfg.w_style, cfg.w_content, cfg.w_tv, cfg.w_edge,
         cfg.style_img_weight, cfg.learning_rate],
        jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "n_styles"))
def _stylize_jit(
    cfg: GatysConfig,
    n_styles: int,
    weights: jnp.ndarray,
    vgg_params,
    content: jnp.ndarray,
    styles: Tuple[jnp.ndarray, ...],
    key: jax.Array,
    init: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """content: (1, H, W, 3) in [0,1]; styles: tuple of (1, Hs, Ws, 3)."""
    compute_dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    mean = jnp.asarray(VGG_MEAN, jnp.float32)
    std = jnp.asarray(VGG_STD, jnp.float32)
    all_layers = tuple(dict.fromkeys(cfg.content_layers + cfg.style_layers))

    # --- feature targets (the reference computes these under no_grad,
    # run_style_transfer.py:78-80) ---
    normed_content = losses.normalize(content, mean, std)
    content_feats = vgg19.extract_features(
        vgg_params, normed_content, all_layers, compute_dtype
    )
    style_feats_list = tuple(
        vgg19.extract_features(
            vgg_params,
            losses.normalize(s, mean, std),
            cfg.style_layers,
            compute_dtype,
        )
        for s in styles[:n_styles]
    )

    if cfg.channel_attention:
        # SE attention over the content features (intended reference
        # behavior; see models/channel_attention.py docstring).
        import zlib

        ca_key = jax.random.fold_in(key, 1)
        new_feats = dict(content_feats)
        for layer in cfg.content_layers:
            c = content_feats[layer].shape[-1]
            ca_params = channel_attention.init_params(
                jax.random.fold_in(ca_key, zlib.crc32(layer.encode())), c
            )
            new_feats[layer] = channel_attention.apply(
                ca_params, content_feats[layer]
            )
        content_feats = new_feats

    target_grad = None
    if cfg.w_edge > 0:
        target_grad = losses.gradient_images(
            losses.to_grayscale(normed_content)
        )

    loss_fn = _make_loss_fn(
        cfg, weights, vgg_params, content_feats, style_feats_list, target_grad,
        compute_dtype,
    )
    value_and_grad = jax.value_and_grad(loss_fn)

    if init is not None:
        img0 = init.astype(jnp.float32)  # resume path (optimize.checkpoint)
    elif cfg.random_init:
        img0 = jax.random.normal(key, content.shape, jnp.float32)
    else:
        img0 = content.astype(jnp.float32)

    loss_hist0 = jnp.zeros((cfg.num_steps,), jnp.float32)

    if cfg.optimizer == "lbfgs":
        # native-shape state: flattening the NHWC gradient forced XLA
        # layout-conversion copies (~0.75 ms/iter at 512px)
        opt_state0 = lbfgs.init_state(img0.shape, memory_size=cfg.lbfgs_memory)

        def body(i, carry):
            img, opt_state, hist = carry
            img = jnp.clip(img, 0.0, 1.0)  # per-closure clamp (:108-109)
            value, grad = value_and_grad(img)
            step_vec, opt_state = lbfgs.update(grad, opt_state, lr=weights[5])
            img = img + step_vec
            return img, opt_state, hist.at[i].set(value)

        img, _, hist = jax.lax.fori_loop(
            0, cfg.num_steps, body, (img0, opt_state0, loss_hist0)
        )
    elif cfg.optimizer == "adam":
        opt = optax.adam(cfg.adam_lr)
        opt_state0 = opt.init(img0)

        def body(i, carry):
            img, opt_state, hist = carry
            img = jnp.clip(img, 0.0, 1.0)
            value, grad = value_and_grad(img)
            updates, opt_state = opt.update(grad, opt_state, img)
            img = optax.apply_updates(img, updates)
            return img, opt_state, hist.at[i].set(value)

        img, _, hist = jax.lax.fori_loop(
            0, cfg.num_steps, body, (img0, opt_state0, loss_hist0)
        )
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")

    return jnp.clip(img, 0.0, 1.0), hist


def stylize(
    content: jnp.ndarray,
    styles: Sequence[jnp.ndarray],
    cfg: GatysConfig,
    vgg_params,
    key: Optional[jax.Array] = None,
    init: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run Gatys optimization. Returns (image (1,H,W,3) in [0,1], loss history).

    ``styles`` holds one or two NHWC style images; two trigger style mixing
    with ``cfg.style_img_weight`` (reference run_style_transfer.py:61-65).
    ``init`` overrides the starting pixels (checkpoint resume) while the
    content/style targets stay those of ``content``/``styles``.
    """
    if key is None:
        key = jax.random.key(cfg.seed)
    styles = tuple(s.astype(jnp.float32) for s in styles)
    ncfg = _normalize_static(cfg)
    dyn = (_weights_array(cfg), vgg_params, content.astype(jnp.float32),
           styles, key, init)
    from tbist_tpu.utils import aot

    if aot.enabled():
        # one-shot cold starts: load a serialized executable instead of
        # paying the remote compile (utils/aot.py; falls back silently)
        return aot.call_cached(
            _stylize_jit, "gatys_stylize", repr((ncfg, len(styles))),
            (ncfg, len(styles)), dyn,
        )
    return _stylize_jit(ncfg, len(styles), *dyn)
