"""SAM structural tests (tiny config, seeded weights)."""

import jax
import jax.numpy as jnp
import numpy as np

from tbist_tpu.models import sam

TINY = sam.SamConfig(
    img_size=64, patch=16, width=32, layers=2, heads=2, window=2,
    global_layers=(1,), embed_dim=32, decoder_heads=2, decoder_layers=2,
    mlp_dim=64, num_mask_tokens=4,
)
PARAMS = sam.init_params(jax.random.key(0), TINY)


class TestSam:
    def test_image_encoder_shape(self):
        img = jax.random.normal(jax.random.key(1), (1, 64, 64, 3), jnp.float32)
        emb = sam.encode_image(PARAMS, TINY, img)
        assert emb.shape == (1, 4, 4, 32)
        assert np.isfinite(np.asarray(emb)).all()

    def test_decode_masks_shape(self):
        emb = jax.random.normal(jax.random.key(2), (1, 4, 4, 32), jnp.float32)
        boxes = jnp.asarray([[0.1, 0.1, 0.6, 0.7], [0.2, 0.3, 0.9, 0.8]])
        masks = sam.decode_masks(PARAMS, TINY, emb, boxes)
        assert masks.shape == (2, 16, 16)  # 4x upscaled grid
        assert np.isfinite(np.asarray(masks)).all()

    def test_predict_boxes_end_to_end(self):
        rng = np.random.default_rng(3)
        img = (rng.random((50, 70, 3)) * 255).astype(np.uint8)
        boxes = np.asarray([[10.0, 10.0, 40.0, 45.0]], np.float32)
        masks = sam.predict_boxes(PARAMS, TINY, img, boxes)
        assert masks.shape == (1, 50, 70)
        assert masks.dtype == bool

    def test_split_encode_decode_matches_predict_boxes(self):
        """encode_uint8 + masks_from_embedding == predict_boxes, for both
        host-numpy and already-on-device uint8 inputs (the DINO+SAM chain
        uploads the frame once and shares the device array)."""
        rng = np.random.default_rng(6)
        img = (rng.random((50, 70, 3)) * 255).astype(np.uint8)
        boxes = np.asarray([[10.0, 10.0, 40.0, 45.0]], np.float32)
        want = sam.predict_boxes(PARAMS, TINY, img, boxes)
        for inp in (img, jnp.asarray(img)):
            emb, scale, nh, nw = sam.encode_uint8(PARAMS, TINY, inp)
            got = sam.masks_from_embedding(
                PARAMS, TINY, emb, scale, nh, nw, 50, 70, boxes
            )
            np.testing.assert_array_equal(got, want)

    def test_window_partition_roundtrip(self):
        x = jax.random.normal(jax.random.key(4), (1, 6, 5, 8), jnp.float32)
        wins, pad_hw = sam._window_partition(x, 4)
        back = sam._window_unpartition(wins, 4, pad_hw, (6, 5))
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)

    def test_grid_pe_shape(self):
        g = jax.random.normal(jax.random.key(5), (2, 16), jnp.float32)
        pe = sam._grid_pe(g, 4)
        assert pe.shape == (4, 4, 32)
