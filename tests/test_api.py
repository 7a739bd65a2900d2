"""API-level contract tests."""

import numpy as np
from PIL import Image

from tbist_tpu import api
from tbist_tpu.compose.pipeline import ModelRegistry
from tbist_tpu.utils.config import EffectRequest, TextEffectConfig
from tbist_tpu.utils.logging import RunMetrics


class TestApi:
    def test_texture_only_without_image(self):
        """Reference parity: style-mask-only needs no input image
        (app.py:252-263 — returns the emoji stencil as an image)."""
        out = api.apply_image(
            None, EffectRequest(text=TextEffectConfig(texture_prompt="fire"))
        )
        assert out is not None
        assert out.size == (172, 172)

    def test_texture_only_reports_degraded(self):
        """The early stencil path must carry degraded flags too (this env
        has no T5 weights, so the extractor is the rasterize fallback)."""
        metrics = RunMetrics()
        out = api.apply_image(
            None,
            EffectRequest(text=TextEffectConfig(texture_prompt="fire")),
            metrics=metrics,
        )
        assert out is not None
        assert "emoji_fallback" in metrics.degraded

    def test_injected_component_not_flagged_degraded(self):
        """Degraded flags are per-resolution: a caller-supplied extractor
        must not inherit an earlier fallback's process-global mark."""
        import jax.numpy as jnp

        from tbist_tpu.utils import degraded

        # simulate an earlier request in this process having fallen back
        degraded.mark("emoji_extractor", "emoji_fallback")
        reg = ModelRegistry(
            emoji_extractor=lambda prompt: jnp.ones((172, 172), bool)
        )
        metrics = RunMetrics()
        out = api.apply_image(
            None,
            EffectRequest(text=TextEffectConfig(texture_prompt="fire")),
            registry=reg,
            metrics=metrics,
        )
        assert out is not None
        assert metrics.degraded == []

    def test_no_image_other_requests_none(self):
        assert api.apply_image(None, EffectRequest(grayscale=True)) is None

    def test_pil_round_trip(self):
        rng = np.random.default_rng(0)
        img = Image.fromarray((rng.random((20, 24, 3)) * 255).astype(np.uint8))
        out = api.apply_image(img, EffectRequest(grayscale=True))
        assert out.size == img.size
        arr = np.asarray(out)
        assert np.abs(arr[..., 0].astype(int) - arr[..., 1].astype(int)).max() <= 1
