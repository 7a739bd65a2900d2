"""Mask compositing parity tests.

The emoji-merge oracle below reimplements the reference algorithm
(text/emoji_segmentation_style_transfer.py:65-179) directly in numpy —
sliding cut windows from 4 corner anchors with per-window max
normalization — to validate the batched gather/scatter formulation in
tbist_tpu.ops.masks.
"""

import math

import cv2
import jax.numpy as jnp
import numpy as np

from tbist_tpu.ops import masks
from tbist_tpu.ops.filters import blur_mask

RNG = np.random.default_rng(7)


def _oracle_merge(seg_mask, emoji_mask, blur_strength, step_mult, scales):
    if blur_strength % 2 != 1:
        blur_strength += 1
    num = (np.where(seg_mask, 1, 0).astype(np.uint8)) * 255
    blurred = cv2.GaussianBlur(num, (blur_strength, blur_strength), 0) / 255.0
    H, W = blurred.shape
    emo = np.where(emoji_mask, 1.0, 0.0)
    He, We = emo.shape
    merged = np.zeros_like(blurred)
    for scale in scales:
        kh, kw = int(He * scale), int(We * scale)
        em = cv2.resize(emo, (kw, kh), interpolation=cv2.INTER_LINEAR)
        em = em / np.max(em)
        sh = max(math.floor(kh * step_mult), 1)
        sw = max(math.floor(kw * step_mult), 1)
        # LT anchor
        for i in range(0, H, sh):
            for j in range(0, W, sw):
                region = blurred[i : i + kh, j : j + kw]
                rh, rw = region.shape
                add = region * em[:rh, :rw]
                merged[i : i + kh, j : j + kw] += add / (np.max(add) + 1e-7)
        # RT anchor
        for i in range(0, H, sh):
            for j in range(W, 1, -sw):
                left = max(j - kw, 0)
                region = blurred[i : i + kh, left:j]
                rh, rw = region.shape
                add = region * em[:rh, kw - rw :]
                merged[i : i + kh, left:j] += add / (np.max(add) + 1e-7)
        # LB anchor
        for i in range(H, 1, -sh):
            for j in range(0, W, sw):
                top = max(i - kh, 0)
                region = blurred[top:i, j : j + kw]
                rh, rw = region.shape
                add = region * em[kh - rh :, :rw]
                merged[top:i, j : j + kw] += add / (np.max(add) + 1e-7)
        # RB anchor
        for i in range(H, 1, -sh):
            for j in range(W, 1, -sw):
                top, left = max(i - kh, 0), max(j - kw, 0)
                region = blurred[top:i, left:j]
                rh, rw = region.shape
                add = region * em[kh - rh :, kw - rw :]
                merged[top:i, left:j] += add / (np.max(add) + 1e-7)
    return merged / np.max(merged)


class TestCompositeByMask:
    def test_hard_select(self):
        content = jnp.zeros((1, 8, 8, 3))
        style = jnp.ones((1, 8, 8, 3))
        mask = jnp.zeros((8, 8), bool).at[2:5, 3:6].set(True)
        out = masks.composite_by_mask(content, style, mask, edge_smoothing=0)
        got = np.asarray(out[0, ..., 0])
        np.testing.assert_array_equal(got, np.asarray(mask).astype(np.float32))

    def test_feathered_blend_matches_cv2_blur(self):
        content = jnp.zeros((1, 16, 16, 3))
        style = jnp.ones((1, 16, 16, 3))
        m = np.zeros((16, 16), bool)
        m[4:12, 4:12] = True
        out = masks.composite_by_mask(content, style, jnp.asarray(m), edge_smoothing=5)
        want = cv2.GaussianBlur((m.astype(np.uint8) * 255), (5, 5), 0) / 255.0
        np.testing.assert_allclose(
            np.asarray(out[0, ..., 0]), want, atol=2e-3
        )

    def test_shape_reconciliation(self):
        content = jnp.zeros((1, 10, 10, 3))
        style = jnp.ones((1, 8, 12, 3))
        mask = jnp.ones((10, 10), bool)
        out = masks.composite_by_mask(content, style, mask, edge_smoothing=0)
        assert out.shape == (1, 8, 10, 3)


class TestEmojiMerge:
    def test_matches_reference_oracle(self):
        seg = np.zeros((64, 64), bool)
        seg[16:48, 20:50] = True
        emoji = RNG.random((16, 16)) > 0.4

        got = np.asarray(
            masks.merge_content_style_masks(jnp.asarray(seg), jnp.asarray(emoji), 15, 0.5)
        )
        want = _oracle_merge(seg, emoji, 15, 0.5, masks.EMOJI_SCALES)
        # cv2's fixed-point uint8 blur rounds slightly differently than our
        # float blur + single rounding; the per-window max normalization
        # amplifies those sub-LSB gaps on a handful of fringe pixels.
        diff = np.abs(got - want)
        assert (diff > 5e-3).mean() < 0.005, (diff > 5e-3).mean()
        assert diff.max() < 0.05, diff.max()

    def test_output_range(self):
        seg = jnp.ones((40, 40), bool)
        emoji = jnp.asarray(RNG.random((12, 12)) > 0.5)
        out = np.asarray(masks.merge_content_style_masks(seg, emoji, 9, 0.5))
        assert out.min() >= 0.0 and out.max() <= 1.0 + 1e-6
        assert out.max() > 0.5  # normalized to 1 somewhere

    def test_empty_emoji_is_zero_not_nan(self):
        seg = jnp.ones((40, 40), bool)
        emoji = jnp.zeros((12, 12), bool)
        out = np.asarray(masks.merge_content_style_masks(seg, emoji, 9, 0.5))
        assert np.isfinite(out).all()

    def test_emoji_composite_blends(self):
        content = jnp.zeros((1, 40, 40, 3))
        style = jnp.ones((1, 40, 40, 3))
        seg = jnp.ones((40, 40), bool)
        emoji = jnp.asarray(RNG.random((12, 12)) > 0.5)
        out = np.asarray(
            masks.emoji_composite(content, style, seg, emoji, 9, 0.5, 1.5)
        )
        assert out.min() >= 0.0 and out.max() <= 1.0
        assert out.std() > 0.01  # actual texture, not constant


class TestBatchedComposites:
    """Batched composites (the masked-text video lane) must equal the
    single-image ops per frame."""

    def test_composite_by_masks_batch_matches_single(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(5)
        c = jnp.asarray(rng.random((3, 24, 20, 3)).astype(np.float32))
        s = jnp.asarray(rng.random((3, 24, 20, 3)).astype(np.float32))
        m = jnp.asarray(rng.random((3, 24, 20)) > 0.5)
        for edge in (0, 5):
            batch = masks.composite_by_masks_batch(c, s, m, edge)
            for i in range(3):
                single = masks.composite_by_mask(
                    c[i : i + 1], s[i : i + 1], m[i], edge
                )
                np.testing.assert_allclose(
                    np.asarray(batch[i]), np.asarray(single[0]), atol=1e-6
                )

    def test_emoji_composite_batch_matches_single(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(6)
        c = jnp.asarray(rng.random((2, 48, 40, 3)).astype(np.float32))
        s = jnp.asarray(rng.random((2, 48, 40, 3)).astype(np.float32))
        seg = jnp.asarray(rng.random((2, 48, 40)) > 0.4)
        emoji = jnp.asarray(rng.random((17, 17)) > 0.5)
        batch = masks.emoji_composite_batch(c, s, seg, emoji, 31, 0.5, 1.5)
        for i in range(2):
            single = masks.emoji_composite(
                c[i : i + 1], s[i : i + 1], seg[i], emoji, 31, 0.5, 1.5
            )
            np.testing.assert_allclose(
                np.asarray(batch[i]), np.asarray(single[0]), atol=1e-5
            )

    def test_blur_masks_matches_blur_mask(self):
        import jax.numpy as jnp

        from tbist_tpu.ops.filters import blur_mask, blur_masks

        rng = np.random.default_rng(7)
        m = jnp.asarray(rng.random((4, 30, 26)) > 0.5)
        batch = blur_masks(m, 9)
        for i in range(4):
            np.testing.assert_array_equal(
                np.asarray(batch[i]), np.asarray(blur_mask(m[i], 9))
            )
