"""Effect-composition pipeline — the reference's if-tree as a data table.

Reference: ``apply_image_process`` (app.py:116-740) chains effects in the
fixed order grayscale → text → pixel art → style transfer → style mixing →
color palette → depth, where each heavyweight effect repeats a 3-way
text-mask dispatch (location-only / texture-only / location+texture: apply
the effect to the ORIGINAL image, then mask-composite; any combo with
transfer: apply to the running output). Here that dispatch is one shared
function and each stage is a row in a table.

Models (mask extractor, emoji extractor, text transfer, depth) are
injected through a registry so the pipeline is testable with stubs and the
heavy networks load lazily.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tbist_tpu.effects import basic, pixel_art as pixel_art_fx, style as style_fx
from tbist_tpu.ops import masks as mask_ops
from tbist_tpu.utils.config import EffectRequest, TextEffectConfig
from tbist_tpu.utils.logging import RunMetrics


@dataclasses.dataclass
class ModelRegistry:
    """Injected model callables; every field has a lazy default."""

    vgg_params: Any = None
    # (image NHWC, prompt) -> stylized NHWC
    text_transfer: Optional[Callable] = None
    # (image, prompt) -> (H, W) bool mask. image arrives as NHWC float
    # [0,1] OR (H, W, 3) uint8 0-255 — the preprocess path hands the
    # extractor host uint8 so uploads stay uint8 (CLAUDE.md transfer
    # rule); injected extractors must accept both forms (the builtins do)
    mask_extractor: Optional[Callable] = None
    # (frames (B, H, W, 3) uint8, prompt) -> (B, H, W) bool masks — the
    # masked-text VIDEO lane's chunk extractor (one DINO + one SAM
    # program per chunk); lazily masking.default_batch_mask_extractor
    batch_mask_extractor: Optional[Callable] = None
    # (prompt) -> (He, We) bool stencil
    emoji_extractor: Optional[Callable] = None
    # (image NHWC) -> (H, W) float depth
    depth_estimator: Optional[Callable] = None
    # fields the lazy loaders resolved (vs caller-injected) — degraded
    # flags only apply to these, so a caller supplying real weights is
    # never reported as degraded by an earlier fallback in this process
    resolved_by_loader: set = dataclasses.field(default_factory=set)

    def ensure(self, *names: str) -> "ModelRegistry":
        """Lazily resolve only the models a request actually needs."""
        for name in names:
            if getattr(self, name) is not None:
                continue
            self.resolved_by_loader.add(name)
            if name == "vgg_params":
                from tbist_tpu.weights import vgg as vgg_weights

                self.vgg_params = vgg_weights.get_params()
            elif name == "text_transfer":
                from tbist_tpu.effects import text_transfer as tt

                self.text_transfer = lambda img, prompt: tt.perform_transfer(
                    img, prompt
                )
            elif name == "mask_extractor":
                from tbist_tpu.effects import masking

                self.mask_extractor = masking.default_mask_extractor()
            elif name == "batch_mask_extractor":
                from tbist_tpu.effects import masking

                self.batch_mask_extractor = masking.default_batch_mask_extractor()
            elif name == "emoji_extractor":
                from tbist_tpu.effects import masking

                self.emoji_extractor = masking.default_emoji_extractor()
            elif name == "depth_estimator":
                from tbist_tpu.effects import depth as depth_fx

                self.depth_estimator = depth_fx.default_depth_estimator()
        return self


@dataclasses.dataclass
class EffectInputs:
    """Host-side images the effects consume (style refs, palettes)."""

    style_image: Optional[jnp.ndarray] = None  # style transfer + depth
    style_image1: Optional[jnp.ndarray] = None  # mixing
    style_image2: Optional[jnp.ndarray] = None
    color_palette_image: Optional[jnp.ndarray] = None  # Reinhard target
    pixel_palette_image: Optional[jnp.ndarray] = None  # palette-from-image


@dataclasses.dataclass
class _TextState:
    """Masks computed once by the text stage and reused downstream."""

    loc_mask: Optional[jnp.ndarray] = None  # (H, W) bool
    emoji_mask: Optional[jnp.ndarray] = None  # (He, We) bool
    mode: str = "none"  # none|transfer|location|texture|location+texture


def _text_mode(cfg: Optional[TextEffectConfig]) -> str:
    if cfg is None:
        return "none"
    t = bool(cfg.style_prompt)
    l = bool(cfg.location_prompt)
    x = bool(cfg.texture_prompt)
    if t:
        return "transfer"
    if l and x:
        return "location+texture"
    if l:
        return "location"
    if x:
        return "texture"
    return "none"


def _masked_apply(
    effect_fn: Callable[[jnp.ndarray], jnp.ndarray],
    original: jnp.ndarray,
    current: jnp.ndarray,
    state: _TextState,
    req: EffectRequest,
) -> jnp.ndarray:
    """Shared 3-way text-mask dispatch around a downstream effect."""
    comp = req.composite
    if state.mode == "location":
        styled = effect_fn(original)
        return mask_ops.composite_by_mask(
            original, styled, state.loc_mask, int(comp.edge_smoothing)
        )
    if state.mode == "texture":
        styled = effect_fn(original)
        ones = jnp.ones(styled.shape[1:3], bool)
        return mask_ops.emoji_composite(
            original, styled, ones, state.emoji_mask,
            comp.blur_strength, comp.step_size_multiplier, comp.style_strength,
        )
    if state.mode == "location+texture":
        styled = effect_fn(original)
        return mask_ops.emoji_composite(
            original, styled, state.loc_mask, state.emoji_mask,
            comp.blur_strength, comp.step_size_multiplier, comp.style_strength,
        )
    return effect_fn(current)


def needed_components(req: EffectRequest) -> list:
    """ModelRegistry fields a request will exercise."""
    needed = []
    if req.style_transfer or req.style_mixing or req.depth is not None:
        needed.append("vgg_params")
    if req.text is not None:
        if req.text.style_prompt:
            needed.append("text_transfer")
        if req.text.location_prompt:
            needed.append("mask_extractor")
        if req.text.texture_prompt:
            needed.append("emoji_extractor")
    if req.depth is not None:
        needed.append("depth_estimator")
    return needed


def apply_image(
    image: jnp.ndarray,
    req: EffectRequest,
    inputs: Optional[EffectInputs] = None,
    registry: Optional[ModelRegistry] = None,
    metrics: Optional[RunMetrics] = None,
) -> Optional[jnp.ndarray]:
    """Run the effect chain on an NHWC [0,1] image. None on invalid input,
    matching the reference's contract (SURVEY §5 failure handling)."""
    inputs = inputs or EffectInputs()
    registry = registry or ModelRegistry()
    needed = needed_components(req)
    registry.ensure(*needed)
    metrics = metrics if metrics is not None else RunMetrics()
    try:
        return _apply_stages(image, req, inputs, registry, metrics)
    finally:
        # Surface fallback/seeded components for this request. Collected
        # after the stages ran because some loaders (CLIP text encoder,
        # Ghiasi params) resolve lazily inside the effect call.
        from tbist_tpu.utils import degraded as _degraded

        flags = _degraded.flags_for(
            n for n in needed if n in registry.resolved_by_loader
        )
        if flags:
            metrics.degraded = sorted(set(metrics.degraded) | set(flags))


def _apply_stages(
    image: jnp.ndarray,
    req: EffectRequest,
    inputs: EffectInputs,
    registry: ModelRegistry,
    metrics: RunMetrics,
) -> Optional[jnp.ndarray]:
    """The seven ordered effect stages (reference app.py:157-735)."""
    original = image
    output = image
    state = _TextState()

    # ---- 1. grayscale (app.py:157-159) ----
    if req.grayscale:
        output = basic.grayscale(output)

    # ---- 2. text effects (app.py:161-282) ----
    tcfg = req.text
    state.mode = _text_mode(tcfg)
    if state.mode != "none":
        if tcfg.location_prompt:
            from tbist_tpu.effects import masking as masking_fx

            state.loc_mask = masking_fx.extract_location_mask(
                registry.mask_extractor, original, tcfg
            )
        if tcfg.texture_prompt:
            state.emoji_mask = registry.emoji_extractor(tcfg.texture_prompt)

        if state.mode == "transfer":
            styled = registry.text_transfer(original, tcfg.style_prompt)
            has_l, has_x = bool(tcfg.location_prompt), bool(tcfg.texture_prompt)
            if has_l and has_x:
                output = mask_ops.emoji_composite(
                    original, styled, state.loc_mask, state.emoji_mask,
                    tcfg.emoji_blur_strength, tcfg.emoji_step_size,
                    tcfg.emoji_style_strength,
                )
            elif has_l:
                output = mask_ops.composite_by_mask(
                    original, styled, state.loc_mask, int(tcfg.edge_smoothing)
                )
            elif has_x:
                ones = jnp.ones(styled.shape[1:3], bool)
                output = mask_ops.emoji_composite(
                    original, styled, ones, state.emoji_mask,
                    tcfg.emoji_blur_strength, tcfg.emoji_step_size,
                    tcfg.emoji_style_strength,
                )
            else:
                output = styled
        elif state.mode == "location":
            m = state.loc_mask.astype(jnp.float32)
            output = jnp.repeat(m[None, ..., None], 3, axis=-1)
        elif state.mode == "texture":
            m = state.emoji_mask.astype(jnp.float32)
            output = jnp.repeat(m[None, ..., None], 3, axis=-1)
        else:  # location+texture: merged-mask visualization (app.py:265-282)
            merged = mask_ops.merge_content_style_masks(
                state.loc_mask, state.emoji_mask,
                tcfg.emoji_blur_strength, tcfg.emoji_step_size,
            )
            output = jnp.repeat(merged[None, ..., None], 3, axis=-1)

    # ---- 3. pixel art (app.py:284-370) ----
    if req.pixel_art is not None:
        pcfg = req.pixel_art
        palette = None
        if pcfg.use_palette and pcfg.palette_from_image:
            if inputs.pixel_palette_image is None:
                return None
            from tbist_tpu.ops import palette as palette_ops

            palette = palette_ops.palette_from_image(
                np.asarray(inputs.pixel_palette_image[0]),
                pcfg.palette_num_colors,
                jax.random.key(0),
            )
        output = _masked_apply(
            lambda img: pixel_art_fx.pixel_art(img, pcfg, palette=palette),
            original, output, state, req,
        )

    # ---- 4. style transfer (app.py:372-470) ----
    if req.style_transfer:
        if inputs.style_image is None:
            return None
        output = _masked_apply(
            lambda img: style_fx.style_transfer(
                img, [inputs.style_image], req.gatys, registry.vgg_params,
                metrics=metrics,
            ),
            original, output, state, req,
        )

    # ---- 5. style mixing (app.py:472-590) ----
    if req.style_mixing:
        styles = [s for s in (inputs.style_image1, inputs.style_image2) if s is not None]
        if not styles:
            return None
        output = _masked_apply(
            lambda img: style_fx.style_transfer(
                img, styles, req.gatys, registry.vgg_params, metrics=metrics
            ),
            original, output, state, req,
        )

    # ---- 6. color palette transfer (app.py:592-658) ----
    if req.color_palette:
        if inputs.color_palette_image is None:
            return None
        output = _masked_apply(
            lambda img: basic.color_palette_transfer(img, inputs.color_palette_image),
            original, output, state, req,
        )

    # ---- 7. depth-based style transfer (app.py:660-735) ----
    if req.depth is not None:
        if inputs.style_image is None:
            return None
        from tbist_tpu.effects import depth as depth_fx

        dcfg = req.depth
        output = _masked_apply(
            lambda img: depth_fx.depth_style_transfer(
                img, inputs.style_image, dcfg, req.gatys,
                registry.depth_estimator, registry.vgg_params, metrics=metrics,
            ),
            original, output, state, req,
        )

    return output
