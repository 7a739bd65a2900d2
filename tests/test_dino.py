"""Structural tests for Swin/BERT/GroundingDINO with tiny random configs."""

import jax
import jax.numpy as jnp
import numpy as np

from tbist_tpu.models import bert as bert_lib
from tbist_tpu.models import dino as dino_lib
from tbist_tpu.models import swin as swin_lib

SWIN_TINY = swin_lib.SwinConfig(
    embed_dim=8, depths=(1, 1, 1, 1), heads=(1, 2, 4, 8), window=4,
    mlp_ratio=2, out_indices=(1, 2, 3),
)
BERT_TINY = bert_lib.BertConfig(
    vocab=128, hidden=32, layers=2, heads=2, ffn=64, max_pos=64, type_vocab=2
)
DINO_TINY = dino_lib.DinoConfig(
    d_model=16, heads=2, levels=4, points=2, enc_layers=2, dec_layers=2,
    ffn=32, num_queries=20, fusion_heads=2, fusion_dim=32,
)


class TestSwin:
    def test_feature_pyramid_shapes(self):
        params = swin_lib.init_params(jax.random.key(0), SWIN_TINY)
        img = jax.random.uniform(jax.random.key(1), (1, 64, 96, 3), jnp.float32)
        outs = swin_lib.forward(params, SWIN_TINY, img)
        assert len(outs) == 3
        assert outs[0].shape == (1, 8, 12, 16)   # stride 8, 2*embed
        assert outs[1].shape == (1, 4, 6, 32)    # stride 16
        assert outs[2].shape == (1, 2, 3, 64)    # stride 32
        for o in outs:
            assert np.isfinite(np.asarray(o)).all()

    def test_shifted_window_mask_changes_output(self):
        """Blocks 0 (no shift) and 1 (shift) must differ structurally:
        verify via a 2-block stage producing finite, non-constant output."""
        cfg = swin_lib.SwinConfig(
            embed_dim=8, depths=(2, 1, 1, 1), heads=(2, 2, 4, 8), window=4,
            mlp_ratio=2, out_indices=(0, 1, 2),
        )
        params = swin_lib.init_params(jax.random.key(2), cfg)
        img = jax.random.uniform(jax.random.key(3), (1, 32, 32, 3), jnp.float32)
        outs = swin_lib.forward(params, cfg, img)
        assert float(jnp.std(outs[0])) > 0


class TestBert:
    def test_sequence_output_and_padding(self):
        params = bert_lib.init_params(jax.random.key(0), BERT_TINY)
        ids = jnp.asarray([[3, 7, 9, 2, 0, 0]], jnp.int32)
        mask = jnp.asarray([[1, 1, 1, 1, 0, 0]], jnp.float32)
        out = bert_lib.forward(params, BERT_TINY, ids, mask)
        assert out.shape == (1, 6, 32)
        # padded positions must not affect valid outputs
        ids2 = ids.at[0, 5].set(99)
        out2 = bert_lib.forward(params, BERT_TINY, ids2, mask)
        np.testing.assert_allclose(
            np.asarray(out)[0, :4], np.asarray(out2)[0, :4], atol=1e-5
        )


class TestDeformableAttention:
    def test_sampling_and_weights(self):
        key = jax.random.key(0)
        d, heads, points = 16, 2, 2
        shapes = ((8, 8), (4, 4))
        lv = sum(h * w for h, w in shapes)
        p = {
            "value_proj_w": jnp.eye(d), "value_proj_b": jnp.zeros(d),
            "sampling_offsets_w": jnp.zeros((d, heads * 2 * points * 2)),
            "sampling_offsets_b": jnp.zeros(heads * 2 * points * 2),
            "attention_weights_w": jnp.zeros((d, heads * 2 * points)),
            "attention_weights_b": jnp.zeros(heads * 2 * points),
            "output_proj_w": jnp.eye(d), "output_proj_b": jnp.zeros(d),
        }
        value = jax.random.uniform(key, (1, lv, d), jnp.float32)
        query = jnp.zeros((1, 3, d))
        refs = jnp.asarray([[[0.5, 0.5], [0.25, 0.25], [0.9, 0.1]]])
        out = dino_lib.deformable_attention(
            query, refs, value, shapes, p, heads, points
        )
        assert out.shape == (1, 3, d)
        assert np.isfinite(np.asarray(out)).all()

    def test_bilinear_sample_center(self):
        v = jnp.arange(16.0).reshape(1, 4, 4, 1)
        # center of pixel (1, 2) -> value 6
        locs = jnp.asarray([[[ (2 + 0.5) / 4, (1 + 0.5) / 4 ]]])
        out = dino_lib._bilinear_sample(v, locs)
        np.testing.assert_allclose(float(out[0, 0, 0]), 6.0, atol=1e-5)

    def test_out_of_bounds_zero(self):
        v = jnp.ones((1, 4, 4, 1))
        locs = jnp.asarray([[[-0.5, -0.5]]])
        out = dino_lib._bilinear_sample(v, locs)
        np.testing.assert_allclose(float(out[0, 0, 0]), 0.0, atol=1e-6)

    def test_interp_matmul_equals_gather(self):
        """The dense interp-matmul path (small levels on TPU) must equal
        the gather formulation everywhere: interior, pixel centers,
        edges, and fully out-of-bounds samples."""
        key = jax.random.key(3)
        v = jax.random.normal(key, (3, 7, 5, 8), jnp.float32)
        rng = np.random.default_rng(4)
        locs = rng.uniform(-0.3, 1.3, size=(3, 64, 2)).astype(np.float32)
        # include exact pixel centers and corners
        locs[:, 0] = [(0.5 + 0.5) / 5, (2 + 0.5) / 7]
        locs[:, 1] = [0.0, 0.0]
        locs[:, 2] = [1.0, 1.0]
        locs = jnp.asarray(locs)
        want = np.asarray(dino_lib._bilinear_sample(v, locs))
        got = np.asarray(dino_lib._interp_matmul_sample(v, locs))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_deformable_attention_same_output_either_path(self, monkeypatch):
        """deformable_attention output is invariant to the sampling
        implementation the threshold selects."""
        key = jax.random.key(0)
        d, heads, points = 16, 2, 2
        shapes = ((8, 8), (4, 4))
        lv = sum(h * w for h, w in shapes)
        keys = jax.random.split(key, 8)
        p = {
            "value_proj_w": jax.random.normal(keys[0], (d, d)) * 0.1,
            "value_proj_b": jnp.zeros(d),
            "sampling_offsets_w": jax.random.normal(keys[1], (d, heads * 2 * points * 2)) * 0.1,
            "sampling_offsets_b": jax.random.normal(keys[2], (heads * 2 * points * 2,)) * 0.5,
            "attention_weights_w": jax.random.normal(keys[3], (d, heads * 2 * points)) * 0.1,
            "attention_weights_b": jnp.zeros(heads * 2 * points),
            "output_proj_w": jax.random.normal(keys[4], (d, d)) * 0.1,
            "output_proj_b": jnp.zeros(d),
        }
        value = jax.random.uniform(keys[5], (1, lv, d), jnp.float32)
        query = jax.random.normal(keys[6], (1, 3, d))
        refs = jnp.asarray([[[0.5, 0.5], [0.25, 0.25], [0.9, 0.1]]])

        def run():
            return np.asarray(
                dino_lib.deformable_attention(
                    query, refs, value, shapes, p, heads, points
                )
            )

        monkeypatch.setattr(dino_lib, "_INTERP_MM_MAX_HW", 0)  # force gather
        gather_out = run()
        monkeypatch.setattr(dino_lib, "_INTERP_MM_MAX_HW", 64)
        # force the matmul path for every level regardless of sample count
        orig = dino_lib._bilinear_sample
        monkeypatch.setattr(dino_lib, "_bilinear_sample", dino_lib._interp_matmul_sample)
        mm_out = run()
        monkeypatch.setattr(dino_lib, "_bilinear_sample", orig)
        np.testing.assert_allclose(mm_out, gather_out, atol=1e-5)

    def test_batched_gather_map_matches_direct(self, monkeypatch):
        """Frame-batched large levels gather via lax.map over the batch
        (the B=8 table falls off the fast-memory cliff otherwise, PROFILE
        round-4b); the mapped form must equal the direct gather."""
        key = jax.random.key(7)
        d, heads, points, b = 16, 2, 2, 4
        shapes = ((8, 8), (4, 4))
        lv = sum(h * w for h, w in shapes)
        keys = jax.random.split(key, 8)
        p = {
            "value_proj_w": jax.random.normal(keys[0], (d, d)) * 0.1,
            "value_proj_b": jnp.zeros(d),
            "sampling_offsets_w": jax.random.normal(keys[1], (d, heads * 2 * points * 2)) * 0.1,
            "sampling_offsets_b": jax.random.normal(keys[2], (heads * 2 * points * 2,)) * 0.5,
            "attention_weights_w": jax.random.normal(keys[3], (d, heads * 2 * points)) * 0.1,
            "attention_weights_b": jnp.zeros(heads * 2 * points),
            "output_proj_w": jax.random.normal(keys[4], (d, d)) * 0.1,
            "output_proj_b": jnp.zeros(d),
        }
        value = jax.random.uniform(keys[5], (b, lv, d), jnp.float32)
        query = jax.random.normal(keys[6], (b, 5, d))
        refs = jax.random.uniform(keys[7], (b, 5, 2))

        def run():
            return np.asarray(
                dino_lib.deformable_attention(
                    query, refs, value, shapes, p, heads, points
                )
            )

        monkeypatch.setattr(dino_lib, "_INTERP_MM_MAX_HW", 0)  # gather only
        monkeypatch.setattr(dino_lib, "_GATHER_MAP_TABLE_BYTES", 1 << 60)
        direct = run()
        monkeypatch.setattr(dino_lib, "_GATHER_MAP_TABLE_BYTES", 0)
        mapped = run()
        np.testing.assert_allclose(mapped, direct, atol=1e-6)


class TestGroundingDino:
    def test_end_to_end_shapes(self):
        params = dino_lib.init_params(
            jax.random.key(0), DINO_TINY, SWIN_TINY, BERT_TINY
        )
        img = jax.random.uniform(jax.random.key(1), (1, 64, 64, 3), jnp.float32)
        ids = jnp.asarray([[2, 5, 7, 3]], jnp.int32)
        mask = jnp.ones_like(ids)
        out = dino_lib.forward(
            params, DINO_TINY, img, ids, mask, SWIN_TINY, BERT_TINY
        )
        assert out["pred_boxes"].shape == (1, 20, 4)
        assert out["pred_logits"].shape == (1, 20, 4)
        boxes = np.asarray(out["pred_boxes"])
        assert (boxes >= 0).all() and (boxes <= 1).all()
        logits = np.asarray(out["pred_logits"])  # (1, 20, T)
        assert np.isfinite(logits[0][:, np.asarray(mask[0], bool)]).all()


class TestTextFeatureCache:
    def test_forward_with_precomputed_text_equals_inline(self):
        """forward(text_feats=encode_text(...)) == forward() — the prompt
        cache (dino_sam._text_features) must not change detection."""
        params = dino_lib.init_params(
            jax.random.key(0), DINO_TINY, SWIN_TINY, BERT_TINY
        )
        img = jax.random.uniform(jax.random.key(1), (1, 64, 64, 3), jnp.float32)
        ids = jnp.asarray([[2, 55, 12, 3]], jnp.int32)
        mask = jnp.ones_like(ids)

        inline = dino_lib.forward(
            params, DINO_TINY, img, ids, mask, SWIN_TINY, BERT_TINY
        )
        feats = dino_lib.encode_text(params, DINO_TINY, ids, mask, BERT_TINY)
        cached = dino_lib.forward(
            params, DINO_TINY, img, ids, mask, SWIN_TINY, BERT_TINY,
            text_feats=feats,
        )
        for k in ("pred_logits", "pred_boxes"):
            np.testing.assert_allclose(
                np.asarray(cached[k]), np.asarray(inline[k]), atol=1e-6
            )
