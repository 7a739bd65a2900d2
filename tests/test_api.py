"""API-level contract tests."""

import numpy as np
from PIL import Image

from tbist_tpu import api
from tbist_tpu.utils.config import EffectRequest, TextEffectConfig


class TestApi:
    def test_texture_only_without_image(self):
        """Reference parity: style-mask-only needs no input image
        (app.py:252-263 — returns the emoji stencil as an image)."""
        out = api.apply_image(
            None, EffectRequest(text=TextEffectConfig(texture_prompt="fire"))
        )
        assert out is not None
        assert out.size == (172, 172)

    def test_no_image_other_requests_none(self):
        assert api.apply_image(None, EffectRequest(grayscale=True)) is None

    def test_pil_round_trip(self):
        rng = np.random.default_rng(0)
        img = Image.fromarray((rng.random((20, 24, 3)) * 255).astype(np.uint8))
        out = api.apply_image(img, EffectRequest(grayscale=True))
        assert out.size == img.size
        arr = np.asarray(out)
        assert np.abs(arr[..., 0].astype(int) - arr[..., 1].astype(int)).max() <= 1
