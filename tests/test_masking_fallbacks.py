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


class TestExtractLocationMaskPreprocess:
    """extract_location_mask geometry: the mask computed on the
    preprocessed detection input lands back in content coordinates."""

    class _Cfg:
        location_prompt = "thing"
        mask_crop = (0, 0, 0, 0)
        mask_square = False
        mask_resize = ()

    @staticmethod
    def _all_true(image, prompt):
        a = np.asarray(image)
        if a.ndim == 4:
            a = a[0]
        return jnp.ones(a.shape[:2], bool)

    def _img(self, h=40, w=60):
        return jnp.asarray(
            np.random.default_rng(0).random((1, h, w, 3)), jnp.float32
        )

    def test_defaults_pass_through(self):
        calls = []

        def spy(image, prompt):
            calls.append(np.asarray(image).shape)
            return self._all_true(image, prompt)

        cfg = self._Cfg()
        m = masking.extract_location_mask(spy, self._img(), cfg)
        assert np.asarray(m).shape == (40, 60)
        assert calls == [(1, 40, 60, 3)]  # untouched input

    def test_crop_places_mask_back(self):
        cfg = self._Cfg()
        cfg.mask_crop = (5, 10, 2, 3)  # left, right, top, bottom
        m = np.asarray(
            masking.extract_location_mask(self._all_true, self._img(), cfg)
        )
        assert m.shape == (40, 60)
        expect = np.zeros((40, 60), bool)
        expect[2:37, 5:50] = True
        np.testing.assert_array_equal(m, expect)

    def test_square_center_crop(self):
        cfg = self._Cfg()
        cfg.mask_square = True
        m = np.asarray(
            masking.extract_location_mask(self._all_true, self._img(), cfg)
        )
        expect = np.zeros((40, 60), bool)
        expect[:, 10:50] = True
        np.testing.assert_array_equal(m, expect)

    def test_resize_roundtrip(self):
        cfg = self._Cfg()
        cfg.mask_resize = (16, 24)
        seen = []

        def spy(image, prompt):
            a = np.asarray(image)
            if a.ndim == 4:
                a = a[0]
            seen.append((a.shape, a.dtype.kind))
            return jnp.ones(a.shape[:2], bool)

        m = np.asarray(
            masking.extract_location_mask(spy, self._img(), cfg)
        )
        # extractor saw the resized input, as uint8 (no float round-trip)
        assert seen == [((16, 24, 3), "u")]
        assert m.shape == (40, 60) and m.all()


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


class TestRasterizeChar:
    """t5_emoji.rasterize_char: reference draw semantics
    (EmojiMaskExtractor.py:62-70) with any TrueType font."""

    FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"

    def test_mask_shape_and_glyph(self):
        import os

        import pytest as _pytest

        if not os.path.exists(self.FONT):
            _pytest.skip("no ttf font in environment")
        from tbist_tpu.models import t5_emoji

        m = np.asarray(t5_emoji.rasterize_char("A", self.FONT))
        assert m.shape == (t5_emoji.EMOJI_SIZE, t5_emoji.EMOJI_SIZE)
        assert m.dtype == bool
        assert 0 < m.sum() < m.size
        # glyph drawn at (20, 10) with size 109: nothing in the top rows
        assert not m[:10].any()
