"""Batched (multi-frame) stylization over a device mesh.

This is the distributed training-step analog for this framework: the
"model" being trained is a batch of images (video frames), the loss is the
Gatys objective against per-frame content targets and shared style grams,
and the optimizer state is per-frame (L-BFGS — formulation selected by
batch size, see ``_lbfgs_init`` — or Adam).

Sharding: frames over ``dp``, image width over ``sp`` (see parallel.mesh).
One jitted ``train_step`` performs loss + grad + optimizer update for the
whole batch; a full run is ``lax.fori_loop`` around it. All cross-device
traffic (conv halo exchange on the sp axis, loss psums) is XLA-inserted.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from tbist_tpu.models import vgg19
from tbist_tpu.ops import losses
from tbist_tpu.optimize import lbfgs
from tbist_tpu.utils.config import VGG_MEAN, VGG_STD, GatysConfig


class BatchState(NamedTuple):
    images: jnp.ndarray  # (B, H, W, 3) pixels being optimized
    opt_state: object  # lbfgs state (formulation by B, _lbfgs_init) or optax
    step: jnp.ndarray


# L-BFGS formulation crossover (TPU, 512px, benchmarks/PROFILE.md
# round-3h): the batch-first shared-slot step (lbfgs.update_batch) wins
# at B<=2 (12.0 vs 51.4 ms/frame at B=1, 13.3 vs 14.6 at B=2) because
# its lax.cond fence keeps the compact-representation block on the MXU;
# above it, the fence's cost of materializing the (B, m, H, W, C)
# history each step overtakes that win and the fully-fused
# vmap(update) formulation is faster (10.3 vs 12.2 ms/frame at B=8).
# B is a static shape inside the jitted step, so the choice compiles in.
_BATCH_FIRST_MAX_B = 2


def _lbfgs_init(b: int, frame_shape, memory_size: int):
    if b <= _BATCH_FIRST_MAX_B:
        return lbfgs.init_batch_state(b, frame_shape, memory_size)
    return jax.vmap(lambda _: lbfgs.init_state(frame_shape, memory_size))(
        jnp.arange(b)
    )


def _lbfgs_update(grads: jnp.ndarray, opt_state, lr: float):
    if grads.shape[0] <= _BATCH_FIRST_MAX_B:
        return lbfgs.update_batch(grads, opt_state, lr=lr)
    return jax.vmap(lambda g, s: lbfgs.update(g, s, lr=lr))(grads, opt_state)


def _per_frame_loss(cfg: GatysConfig, vgg_params, style_grams, compute_dtype,
                    depth_fn=None):
    """Loss for ONE frame (H, W, 3) against its own content features.

    ``w_style_i`` is a per-frame TRACED style weight (enables one compiled
    program to optimize frames with different strengths — e.g. the MIP
    depth layers, style_transfer_depth.py:61-72); ``cfg.w_style`` only
    gates whether the term exists.

    ``depth_fn`` (static) adds the in-graph depth term of
    ``optimize.gatys_depth`` (reference Style_a3.py:142-146, there inert):
    the returned loss_fn then takes a fifth ``target_depth`` arg — the
    depth-mode VIDEO lane vmaps this over a frame batch."""
    mean = jnp.asarray(VGG_MEAN, jnp.float32)
    std = jnp.asarray(VGG_STD, jnp.float32)
    all_layers = tuple(dict.fromkeys(cfg.content_layers + cfg.style_layers))

    def loss_fn(img, content_feats, target_grad, w_style_i, target_depth=None):
        x = img[None]
        normed = losses.normalize(x, mean, std)
        feats = vgg19.extract_features(vgg_params, normed, all_layers, compute_dtype)
        loss = jnp.zeros((), jnp.float32)
        if cfg.w_content > 0:
            loss += cfg.w_content * losses.content_loss(
                feats, content_feats, cfg.content_layers
            )
        if cfg.w_style > 0:
            sl = 0.0
            for layer in cfg.style_layers:
                g = losses.gram_matrix(feats[layer])
                sl = sl + jnp.mean(jnp.square(g - style_grams[layer]))
            loss += w_style_i * sl / len(cfg.style_layers)
        if cfg.w_tv > 0:
            loss += cfg.w_tv * losses.total_variation_loss(normed)
        if cfg.w_edge > 0:
            grad_img = losses.gradient_images(losses.to_grayscale(x))
            loss += cfg.w_edge * losses.edge_loss(target_grad, grad_img)
        if depth_fn is not None and cfg.w_depth > 0:
            from tbist_tpu.ops import mip as mip_ops

            d = mip_ops.normalize_depth(depth_fn(x))
            loss += cfg.w_depth * losses.depth_loss(d, target_depth)
        return loss

    return loss_fn


@functools.partial(jax.jit, static_argnames=("depth_fn",))
def depth_targets(depth_fn, frames: jnp.ndarray) -> jnp.ndarray:
    """Per-frame normalized depth targets as ONE batched program.

    frames: (B, H, W, 3) -> (B, ...) normalized depth maps (the estimator's
    output shape per frame). Matches optimize.gatys_depth's
    ``normalize_depth(depth_fn(content))`` target exactly."""
    from tbist_tpu.ops import mip as mip_ops

    return jax.vmap(lambda f: mip_ops.normalize_depth(depth_fn(f[None])))(frames)


@functools.partial(jax.jit, static_argnames=("cfg",))
def init_batch(
    cfg: GatysConfig,
    vgg_params,
    frames: jnp.ndarray,
    styles: Tuple[jnp.ndarray, ...],
    style_img_weight=None,
):
    """Precompute per-frame content targets and shared style grams.

    frames: (B, H, W, 3) in [0, 1]; styles: tuple of (1, Hs, Ws, 3).
    Returns (state, content_feats, target_grads, style_grams).

    ``style_img_weight`` optionally supplies the two-style mixing weight as
    a TRACED scalar so one compiled program serves every slider value
    (``run`` passes it; None falls back to ``cfg.style_img_weight``).
    """
    compute_dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    mean = jnp.asarray(VGG_MEAN, jnp.float32)
    std = jnp.asarray(VGG_STD, jnp.float32)
    all_layers = tuple(dict.fromkeys(cfg.content_layers + cfg.style_layers))

    def frame_targets(frame):
        x = frame[None]
        feats = vgg19.extract_features(
            vgg_params, losses.normalize(x, mean, std), all_layers, compute_dtype
        )
        grad = losses.gradient_images(
            losses.to_grayscale(losses.normalize(x, mean, std))
        )
        return feats, grad

    content_feats, target_grads = jax.vmap(frame_targets)(frames)

    style_grams = {}
    if len(styles) == 2 and style_img_weight is None:
        style_img_weight = jnp.float32(cfg.style_img_weight)
    for layer in cfg.style_layers:
        feats = [
            vgg19.extract_features(
                vgg_params,
                losses.normalize(s, mean, std),
                (layer,),
                compute_dtype,
            )[layer]
            for s in styles
        ]
        if len(feats) == 2:
            # FEATURE-space mixing, identical to the image path's target
            # (ops.losses.style_loss -> ops.mixing.mix_features; reference
            # StyleMixer.py:25-38): resize both feature maps to the
            # midpoint shape, blend, then Gram. The mixed Gram is a
            # CONSTANT of the optimization, so unlike the per-iteration
            # mix inside optimize.gatys's loss it computes once here.
            from tbist_tpu.ops.mixing import mix_features

            mixed = mix_features(
                feats[0], feats[1], style_img_weight,
                exact_reference=cfg.exact_reference_mixer,
            )
            style_grams[layer] = losses.gram_matrix(mixed)
        else:
            style_grams[layer] = losses.gram_matrix(feats[0])

    b = frames.shape[0]
    frame_shape = frames.shape[1:]
    if cfg.optimizer == "lbfgs":
        opt_state = _lbfgs_init(b, frame_shape, cfg.lbfgs_memory)
    else:
        opt_state = optax.adam(cfg.adam_lr).init(frames)
    state = BatchState(
        images=frames.astype(jnp.float32),
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
    )
    return state, content_feats, target_grads, style_grams


def _train_step_impl(
    cfg: GatysConfig,
    vgg_params,
    state: BatchState,
    content_feats,
    target_grads,
    style_grams,
    w_style=None,
    depth_fn=None,
    target_depths=None,
) -> Tuple[BatchState, jnp.ndarray]:
    compute_dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    loss_fn = _per_frame_loss(cfg, vgg_params, style_grams, compute_dtype,
                              depth_fn)

    imgs = jnp.clip(state.images, 0.0, 1.0)
    if w_style is None:
        w_style = jnp.full((imgs.shape[0],), cfg.w_style, jnp.float32)
    if depth_fn is not None and cfg.w_depth > 0:
        values, grads = jax.vmap(jax.value_and_grad(loss_fn))(
            imgs, content_feats, target_grads, w_style, target_depths
        )
    else:
        values, grads = jax.vmap(jax.value_and_grad(loss_fn))(
            imgs, content_feats, target_grads, w_style
        )

    if cfg.optimizer == "lbfgs":
        step_vecs, opt_state = _lbfgs_update(
            grads, state.opt_state, lr=cfg.learning_rate
        )
        new_imgs = imgs + step_vecs
    else:
        opt = optax.adam(cfg.adam_lr)
        updates, opt_state = opt.update(grads, state.opt_state, imgs)
        new_imgs = optax.apply_updates(imgs, updates)

    return BatchState(new_imgs, opt_state, state.step + 1), values


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def train_step(
    cfg: GatysConfig,
    vgg_params,
    state: BatchState,
    content_feats,
    target_grads,
    style_grams,
    w_style=None,
) -> Tuple[BatchState, jnp.ndarray]:
    """One optimizer step for the whole frame batch. Returns (state, losses(B,)).

    ``w_style`` optionally gives each frame its own traced style weight
    ((B,) array); None uses cfg.w_style for every frame."""
    return _train_step_impl(
        cfg, vgg_params, state, content_feats, target_grads, style_grams, w_style
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "with_history", "depth_fn")
)
def _run_steps(
    cfg: GatysConfig, vgg_params, state, content_feats, target_grads,
    style_grams, w_style=None, with_history: bool = False,
    depth_fn=None, target_depths=None,
):
    """num_steps train steps fused into one program (no per-step dispatch).

    ``with_history`` (static) additionally carries the per-step losses
    ((num_steps, B) f32) through the fori_loop — the single-image sp lane
    reports them as ``RunMetrics.loss_history`` and the multichip dryrun
    asserts trajectory parity on them. Kept off by default so the video
    lane's compiled programs are byte-identical to previous rounds."""

    hist0 = (
        jnp.zeros((cfg.num_steps, state.images.shape[0]), jnp.float32)
        if with_history
        else None
    )

    def body(i, carry):
        st, hist = carry
        st, losses_b = _train_step_impl(
            cfg, vgg_params, st, content_feats, target_grads, style_grams,
            w_style, depth_fn, target_depths,
        )
        if hist is not None:
            hist = hist.at[i].set(losses_b)
        return st, hist

    state, hist = jax.lax.fori_loop(0, cfg.num_steps, body, (state, hist0))
    return (state, hist) if with_history else state


def run(
    cfg: GatysConfig,
    vgg_params,
    frames: jnp.ndarray,
    styles: Tuple[jnp.ndarray, ...],
    w_style=None,
    return_history: bool = False,
    depth_fn=None,
) -> jnp.ndarray:
    """Full batched stylization: init + num_steps train steps + clamp.

    The whole step loop runs as one jitted program; use ``train_step``
    directly when per-step losses or checkpointing are needed. ``w_style``
    optionally assigns each frame its own style weight ((B,) array, traced
    — per-layer MIP strengths reuse this one compiled program). With two
    styles the mixing weight is passed TRACED (cfg's copy is collapsed to
    0.5 for the static jit key), so sweeping the mixing slider reuses one
    compiled program instead of paying a remote compile per value.

    ``return_history`` additionally returns the (num_steps, B) per-step
    loss history (the single-image sp lane's RunMetrics surface).

    ``depth_fn`` (static, with ``cfg.w_depth > 0``) adds the in-graph
    depth term per frame against targets from ONE batched estimator
    program (``depth_targets``) — the depth-mode video lane
    (reference app.py:660-735 per frame inside :784-815)."""
    siw = None
    if len(styles) == 2:
        import dataclasses

        siw = jnp.float32(cfg.style_img_weight)
        cfg = dataclasses.replace(cfg, style_img_weight=0.5)
    state, content_feats, target_grads, style_grams = init_batch(
        cfg, vgg_params, frames, styles, siw
    )
    if w_style is not None:
        w_style = jnp.asarray(w_style, jnp.float32)
    tdepths = None
    if depth_fn is not None and cfg.w_depth > 0:
        tdepths = depth_targets(depth_fn, frames)
    else:
        depth_fn = None
    out = _run_steps(
        cfg, vgg_params, state, content_feats, target_grads, style_grams,
        w_style, return_history, depth_fn, tdepths,
    )
    if return_history:
        state, hist = out
        return jnp.clip(state.images, 0.0, 1.0), hist
    return jnp.clip(out.images, 0.0, 1.0)
