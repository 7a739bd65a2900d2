"""Fallback mask/emoji extractors (used when no checkpoints exist)."""

import jax.numpy as jnp
import numpy as np

from tbist_tpu.effects import masking


class TestFallbackLocationMask:
    def test_segments_center_object(self):
        img = jnp.zeros((1, 32, 32, 3)).at[:, 10:22, 10:22].set(0.9)
        mask = np.asarray(masking._fallback_location_mask(img, "thing"))
        assert mask.shape == (32, 32)
        assert mask[16, 16]  # object center selected
        assert not mask[0, 0]  # background border excluded

    def test_deterministic(self):
        img = jnp.asarray(np.random.default_rng(0).random((1, 16, 16, 3)))
        a = np.asarray(masking._fallback_location_mask(img, "x"))
        b = np.asarray(masking._fallback_location_mask(img, "x"))
        np.testing.assert_array_equal(a, b)


class TestFallbackEmojiStencil:
    def test_shape_and_content(self):
        m = np.asarray(masking._fallback_emoji_stencil("fire"))
        assert m.shape == (masking.EMOJI_SIZE, masking.EMOJI_SIZE)
        assert m.dtype == bool
        assert 0 < m.sum() < m.size  # a glyph, not empty/full

    def test_different_prompts_differ(self):
        a = np.asarray(masking._fallback_emoji_stencil("fire"))
        b = np.asarray(masking._fallback_emoji_stencil("ocean"))
        assert (a != b).any()

    def test_empty_prompt(self):
        m = np.asarray(masking._fallback_emoji_stencil(""))
        assert m.sum() > 0  # falls back to a placeholder glyph

    def test_default_extractors_resolve(self):
        # no checkpoints in this environment -> fallbacks
        f = masking.default_mask_extractor()
        g = masking.default_emoji_extractor()
        assert callable(f) and callable(g)
