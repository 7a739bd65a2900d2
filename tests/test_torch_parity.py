"""Block-level numerical parity vs torch for every weight-layout convention
that a checkpoint converter relies on (VERDICT r1 item 1).

The six model families' converters transpose / split / pack torch weights
into x@W pytrees; these tests prove each packing against the authoritative
torch module on random weights, so a silent key/transpose mistake cannot
survive until real checkpoints arrive. Matches the conventions consumed by:
  * torch nn.MultiheadAttention in-proj packing  -> models/dino.py:_mha
  * Swin window attention (official Swin layout) -> models/swin.py
  * F.grid_sample(align_corners=False)           -> models/dino.py:_bilinear_sample
  * SAM decomposed rel-pos attention             -> models/sam.py:_attn_rel
  * T5 relative-position buckets + encoder/decoder -> models/t5.py
  * CLIP residual-attention block                -> models/clip_text.py
  * HF BERT full encoder                         -> models/bert.py
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tbist_tpu.models import bert as bert_lib  # noqa: E402
from tbist_tpu.models import clip_text  # noqa: E402
from tbist_tpu.models import dino as dino_lib  # noqa: E402
from tbist_tpu.models import sam as sam_lib  # noqa: E402
from tbist_tpu.models import swin as swin_lib  # noqa: E402
from tbist_tpu.models import t5 as t5_lib  # noqa: E402


@pytest.fixture(autouse=True)
def _exact_matmuls():
    with jax.default_matmul_precision("highest"):
        yield


def _t(x):
    return torch.from_numpy(np.array(x, np.float32))


def _j(x):
    return jnp.asarray(np.asarray(x.detach() if hasattr(x, "detach") else x, np.float32))


class TestDinoMHA:
    """dino._mha consumes torch nn.MultiheadAttention weights via
    dino_convert's lin_w (= .T) — prove self/cross/biased outputs match."""

    D, HEADS = 32, 4

    def _params(self, mha):
        return {
            "in_proj_w": _j(mha.in_proj_weight).T,
            "in_proj_b": _j(mha.in_proj_bias),
            "out_proj_w": _j(mha.out_proj.weight).T,
            "out_proj_b": _j(mha.out_proj.bias),
        }

    def test_self_attention(self):
        torch.manual_seed(0)
        mha = torch.nn.MultiheadAttention(self.D, self.HEADS, batch_first=True)
        x = torch.randn(2, 6, self.D)
        want, _ = mha(x, x, x, need_weights=False)
        got = dino_lib._mha(_j(x), _j(x), _j(x), self._params(mha), self.HEADS)
        np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), atol=2e-5)

    def test_cross_attention(self):
        torch.manual_seed(1)
        mha = torch.nn.MultiheadAttention(self.D, self.HEADS, batch_first=True)
        q, kv = torch.randn(2, 5, self.D), torch.randn(2, 9, self.D)
        want, _ = mha(q, kv, kv, need_weights=False)
        got = dino_lib._mha(_j(q), _j(kv), _j(kv), self._params(mha), self.HEADS)
        np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), atol=2e-5)

    def test_additive_bias(self):
        torch.manual_seed(2)
        mha = torch.nn.MultiheadAttention(self.D, self.HEADS, batch_first=True)
        x = torch.randn(2, 6, self.D)
        bias = torch.randn(6, 6)
        want, _ = mha(x, x, x, attn_mask=bias, need_weights=False)
        got = dino_lib._mha(
            _j(x), _j(x), _j(x), self._params(mha), self.HEADS, bias=_j(bias)
        )
        np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), atol=2e-5)


def _torch_swin_window_attention(x, qkv, proj, table, window, heads, mask=None):
    """Official Swin WindowAttention forward (microsoft/Swin-Transformer
    models/swin_transformer.py) on explicit weights."""
    B_, N, C = x.shape
    h = (
        (x @ qkv.weight.T + qkv.bias)
        .reshape(B_, N, 3, heads, C // heads)
        .permute(2, 0, 3, 1, 4)
    )
    q, k, v = h[0], h[1], h[2]
    q = q * (C // heads) ** -0.5
    attn = q @ k.transpose(-2, -1)
    coords = torch.stack(
        torch.meshgrid(torch.arange(window), torch.arange(window), indexing="ij")
    )
    cf = torch.flatten(coords, 1)
    rel = (cf[:, :, None] - cf[:, None, :]).permute(1, 2, 0).contiguous()
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    index = rel.sum(-1)
    bias = table[index.view(-1)].view(N, N, -1).permute(2, 0, 1).contiguous()
    attn = attn + bias.unsqueeze(0)
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.view(B_ // nW, nW, heads, N, N) + mask.unsqueeze(1).unsqueeze(0)
        attn = attn.view(-1, heads, N, N)
    attn = attn.softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(B_, N, C)
    return out @ proj.weight.T + proj.bias


class TestSwinWindowAttention:
    DIM, WINDOW, HEADS = 24, 7, 3

    def _modules(self, seed):
        torch.manual_seed(seed)
        qkv = torch.nn.Linear(self.DIM, 3 * self.DIM)
        proj = torch.nn.Linear(self.DIM, self.DIM)
        table = torch.randn((2 * self.WINDOW - 1) ** 2, self.HEADS)
        p = {
            "qkv_w": _j(qkv.weight).T,
            "qkv_b": _j(qkv.bias),
            "proj_w": _j(proj.weight).T,
            "proj_b": _j(proj.bias),
            "rel_bias_table": _j(table),
        }
        return qkv, proj, table, p

    def test_plain_window(self):
        qkv, proj, table, p = self._modules(3)
        x = torch.randn(8, self.WINDOW**2, self.DIM)
        with torch.no_grad():
            want = _torch_swin_window_attention(
                x, qkv, proj, table, self.WINDOW, self.HEADS
            )
        got = swin_lib._window_attention(_j(x), p, self.HEADS, self.WINDOW)
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)

    def test_shifted_window_mask(self):
        qkv, proj, table, p = self._modules(4)
        mask = swin_lib._shift_mask(14, 14, self.WINDOW, 3)  # (4, 49, 49)
        nW = mask.shape[0]
        x = torch.randn(2 * nW, self.WINDOW**2, self.DIM)
        with torch.no_grad():
            want = _torch_swin_window_attention(
                x, qkv, proj, table, self.WINDOW, self.HEADS, mask=_t(np.asarray(mask))
            )
        got = swin_lib._window_attention(_j(x), p, self.HEADS, self.WINDOW, mask=mask)
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


class TestBilinearSampleVsGridSample:
    def test_matches_grid_sample_zeros_padding(self):
        rng = np.random.default_rng(0)
        n, h, w, d, pts = 3, 9, 13, 5, 64
        value = rng.standard_normal((n, h, w, d)).astype(np.float32)
        # include out-of-bounds and exact-edge locations
        locs = rng.uniform(-0.25, 1.25, size=(n, pts, 2)).astype(np.float32)
        locs[:, 0] = [0.0, 0.0]
        locs[:, 1] = [1.0, 1.0]
        locs[:, 2] = [0.5, 0.5]

        got = dino_lib._bilinear_sample(jnp.asarray(value), jnp.asarray(locs))

        inp = torch.from_numpy(value).permute(0, 3, 1, 2)  # (N, D, H, W)
        grid = torch.from_numpy(locs * 2.0 - 1.0).unsqueeze(1)  # (N, 1, P, 2)
        want = F.grid_sample(
            inp, grid, mode="bilinear", padding_mode="zeros", align_corners=False
        )[:, :, 0].permute(0, 2, 1)  # (N, P, D)
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


def _torch_sam_attn_rel(x, qkv_w, qkv_b, proj_w, proj_b, rel_h, rel_w, heads):
    """Official SAM Attention + add_decomposed_rel_pos
    (facebookresearch/segment-anything modeling/image_encoder.py)."""
    B, H, W, C = x.shape
    qkv = (
        (x.reshape(B, H * W, C) @ qkv_w.T + qkv_b)
        .reshape(B, H * W, 3, heads, -1)
        .permute(2, 0, 3, 1, 4)
        .reshape(3, B * heads, H * W, -1)
    )
    q, k, v = qkv.unbind(0)
    scale = (C // heads) ** -0.5
    attn = (q * scale) @ k.transpose(-2, -1)
    idx_h = torch.arange(H)[:, None] - torch.arange(H)[None, :] + (H - 1)
    idx_w = torch.arange(W)[:, None] - torch.arange(W)[None, :] + (W - 1)
    Rh, Rw = rel_h[idx_h], rel_w[idx_w]
    r_q = q.reshape(B * heads, H, W, -1)
    rel_h_t = torch.einsum("bhwc,hkc->bhwk", r_q, Rh)
    rel_w_t = torch.einsum("bhwc,wkc->bhwk", r_q, Rw)
    attn = (
        attn.view(B * heads, H, W, H, W)
        + rel_h_t[:, :, :, :, None]
        + rel_w_t[:, :, :, None, :]
    ).view(B * heads, H * W, H * W)
    attn = attn.softmax(dim=-1)
    out = (
        (attn @ v)
        .view(B, heads, H, W, -1)
        .permute(0, 2, 3, 1, 4)
        .reshape(B, H, W, C)
    )
    return out @ proj_w.T + proj_b


class TestSamDecomposedRelPos:
    def test_window_attention(self):
        torch.manual_seed(5)
        dim, heads, win, b = 16, 4, 7, 2
        qkv = torch.nn.Linear(dim, 3 * dim)
        proj = torch.nn.Linear(dim, dim)
        rel_h = torch.randn(2 * win - 1, dim // heads)
        rel_w = torch.randn(2 * win - 1, dim // heads)
        x = torch.randn(b, win, win, dim)
        with torch.no_grad():
            want = _torch_sam_attn_rel(
                x, qkv.weight, qkv.bias, proj.weight, proj.bias, rel_h, rel_w, heads
            )
        p = {
            "qkv_w": _j(qkv.weight).T,
            "qkv_b": _j(qkv.bias),
            "proj_w": _j(proj.weight).T,
            "proj_b": _j(proj.bias),
            "rel_pos_h": _j(rel_h),
            "rel_pos_w": _j(rel_w),
        }
        got = sam_lib._attn_rel(_j(x), p, heads, (win, win))
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


class TestT5Parity:
    TINY_KW = dict(
        vocab_size=64, d_model=32, d_kv=8, d_ff=48, num_layers=2, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=20,
        decoder_start_token_id=0, dropout_rate=0.0,
    )

    def _tiny(self):
        transformers = pytest.importorskip("transformers")
        torch.manual_seed(6)
        hf = transformers.T5ForConditionalGeneration(
            transformers.T5Config(**self.TINY_KW)
        ).eval()
        cfg = t5_lib.T5Config(
            vocab=64, d_model=32, d_ff=48, heads=4, d_kv=8, layers=2,
            rel_buckets=8, rel_distance=20,
        )
        sd = {k: v.numpy() for k, v in hf.state_dict().items()}
        params = t5_lib.convert_hf_state_dict(sd, cfg)
        return hf, cfg, params

    def test_relative_position_buckets(self):
        from transformers.models.t5.modeling_t5 import T5Attention

        rel = np.arange(-300, 301, dtype=np.int64)
        for bidir, buckets, dist in [(True, 32, 128), (False, 32, 128), (True, 8, 20)]:
            want = T5Attention._relative_position_bucket(
                torch.from_numpy(rel), bidirectional=bidir,
                num_buckets=buckets, max_distance=dist,
            ).numpy()
            got = np.asarray(
                t5_lib._rel_bucket(jnp.asarray(rel), bidir, buckets, dist)
            )
            np.testing.assert_array_equal(got, want, err_msg=f"bidir={bidir}")

    def test_encoder_parity(self):
        hf, cfg, params = self._tiny()
        rng = np.random.default_rng(1)
        ids = rng.integers(2, 64, size=(2, 7))
        mask = np.ones((2, 7), np.int64)
        mask[1, 5:] = 0
        with torch.no_grad():
            want = hf.encoder(
                input_ids=torch.from_numpy(ids),
                attention_mask=torch.from_numpy(mask),
            ).last_hidden_state.numpy()
        got = np.asarray(
            t5_lib.encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
        )
        # masked-out positions attend differently (HF uses -inf, we use -1e9
        # and they never feed the loss) — compare valid positions
        np.testing.assert_allclose(got[0], want[0], atol=1e-4)
        np.testing.assert_allclose(got[1, :5], want[1, :5], atol=1e-4)

    def test_decoder_step_logits_parity(self):
        """Teacher-forced step-by-step cached decode == HF full forward."""
        hf, cfg, params = self._tiny()
        rng = np.random.default_rng(2)
        ids = rng.integers(2, 64, size=(1, 6))
        mask = np.ones((1, 6), np.int64)
        dec_ids = np.concatenate(
            [[[0]], rng.integers(2, 64, size=(1, 4))], axis=1
        )  # starts with decoder_start_token_id
        with torch.no_grad():
            want = hf(
                input_ids=torch.from_numpy(ids),
                attention_mask=torch.from_numpy(mask),
                decoder_input_ids=torch.from_numpy(dec_ids),
            ).logits.numpy()  # (1, 5, vocab)

        enc_out = t5_lib.encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
        t = dec_ids.shape[1]
        cache = t5_lib.DecodeCache(
            k=jnp.zeros((cfg.layers, 1, cfg.heads, t, cfg.d_kv), jnp.float32),
            v=jnp.zeros((cfg.layers, 1, cfg.heads, t, cfg.d_kv), jnp.float32),
        )
        for pos in range(t):
            logits, cache = t5_lib._decoder_step(
                params, cfg, jnp.asarray(dec_ids[:, pos], jnp.int32),
                jnp.asarray(pos, jnp.int32), cache, enc_out,
                jnp.asarray(mask, jnp.float32),
            )
            np.testing.assert_allclose(
                np.asarray(logits), want[:, pos], atol=1e-4, err_msg=f"pos={pos}"
            )

    def test_greedy_generate_parity(self):
        """Full KV-cached while_loop decode == HF .generate (greedy).

        End-to-end check of the loop the emoji extractor actually runs
        (EmojiMaskExtractor.py:49 calls generate; sampling differs only in
        the final draw): encoder, per-step cached decoder, EOS handling,
        post-EOS pad fill, and the min-length-1 EOS suppression, batched
        with a padded encoder input."""
        hf, cfg, params = self._tiny()
        rng = np.random.default_rng(3)
        ids = rng.integers(2, 64, size=(2, 7))
        mask = np.ones((2, 7), np.int64)
        mask[1, 4:] = 0
        ids[1, 4:] = 0
        max_len = 12
        with torch.no_grad():
            want = hf.generate(
                input_ids=torch.from_numpy(ids),
                attention_mask=torch.from_numpy(mask),
                do_sample=False,
                max_new_tokens=max_len,
                min_new_tokens=1,
            ).numpy()[:, 1:]  # drop decoder_start token
        got = np.asarray(
            t5_lib.generate(
                params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                jax.random.key(0), max_len=max_len, do_sample=False,
            )
        )
        t = want.shape[1]
        np.testing.assert_array_equal(got[:, :t], want)
        assert np.all(got[:, t:] == cfg.pad_id)


class TestT5SamplingParity:
    """The sampled-decode path the reference actually runs
    (EmojiMaskExtractor.py:49: do_sample=True, top_p=0.95, top_k=10)."""

    def _warp(self, logits: np.ndarray, top_k: int, top_p: float) -> np.ndarray:
        """HF's warper chain in generate's order: top-k then top-p."""
        from transformers.generation.logits_process import (
            TopKLogitsWarper,
            TopPLogitsWarper,
        )

        t = torch.from_numpy(logits)
        t = TopKLogitsWarper(top_k=top_k)(None, t)
        t = TopPLogitsWarper(top_p=top_p)(None, t)
        return t.numpy()

    def test_filter_matches_hf_warpers(self):
        pytest.importorskip("transformers")
        rng = np.random.default_rng(11)
        logits = rng.normal(size=(4, 50)).astype(np.float32) * 3
        for top_k, top_p in [(10, 0.95), (3, 0.5), (50, 0.99), (1, 0.95)]:
            want = self._warp(logits, top_k, top_p)
            got = np.asarray(t5_lib.sample_filter(jnp.asarray(logits), top_k, top_p))
            want_inf = np.isinf(want)
            np.testing.assert_array_equal(
                np.isinf(got), want_inf, err_msg=f"k={top_k} p={top_p}"
            )
            np.testing.assert_allclose(
                got[~want_inf], want[~want_inf], atol=1e-6,
                err_msg=f"k={top_k} p={top_p}",
            )

    def test_peaked_distribution_keeps_only_top_token(self):
        pytest.importorskip("transformers")
        # one dominant logit: top-p must prune everything else even with k=10
        logits = np.full((1, 20), -5.0, np.float32)
        logits[0, 7] = 10.0
        want = self._warp(logits, 10, 0.95)
        got = np.asarray(t5_lib.sample_filter(jnp.asarray(logits), 10, 0.95))
        np.testing.assert_array_equal(np.isinf(got), np.isinf(want))
        assert np.isfinite(got[0]).sum() == 1

    def test_sampled_decode_topk1_matches_hf(self):
        """Forced-identical-draws smoke: with top_k=1 the sampled decode is
        deterministic, so our while_loop sampling path must reproduce HF's
        generate(do_sample=True, top_k=1) exactly."""
        hf, cfg, params = TestT5Parity()._tiny()
        rng = np.random.default_rng(12)
        ids = rng.integers(2, 64, size=(2, 6))
        mask = np.ones((2, 6), np.int64)
        max_len = 10
        with torch.no_grad():
            want = hf.generate(
                input_ids=torch.from_numpy(ids),
                attention_mask=torch.from_numpy(mask),
                do_sample=True, top_k=1, top_p=0.95,
                max_new_tokens=max_len, min_new_tokens=1,
            ).numpy()[:, 1:]
        got = np.asarray(
            t5_lib.generate(
                params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                jax.random.key(5), max_len=max_len, do_sample=True,
                top_k=1, top_p=0.95,
            )
        )
        t = want.shape[1]
        np.testing.assert_array_equal(got[:, :t], want)
        assert np.all(got[:, t:] == cfg.pad_id)

    def test_sampled_draws_stay_inside_filtered_support(self):
        """Every sampled token must be one the HF warpers would allow."""
        pytest.importorskip("transformers")
        rng = np.random.default_rng(13)
        logits = rng.normal(size=(2, 32)).astype(np.float32) * 2
        allowed = ~np.isinf(self._warp(logits, 5, 0.8))
        filt = t5_lib.sample_filter(jnp.asarray(logits), 5, 0.8)
        for seed in range(20):
            draw = np.asarray(
                jax.random.categorical(jax.random.key(seed), filt)
            )
            assert allowed[0, draw[0]] and allowed[1, draw[1]], seed


class TestClipAttention:
    def test_residual_attention_vs_torch_mha(self):
        torch.manual_seed(7)
        d, heads, t, b = 64, clip_text.HEADS, 10, 2
        mha = torch.nn.MultiheadAttention(d, heads, batch_first=True)
        x = torch.randn(b, t, d)
        causal = torch.full((t, t), float("-inf")).triu(1)
        with torch.no_grad():
            want, _ = mha(x, x, x, attn_mask=causal, need_weights=False)
        p = {
            "in_proj_w": _j(mha.in_proj_weight),
            "in_proj_b": _j(mha.in_proj_bias),
            "out_proj_w": _j(mha.out_proj.weight),
            "out_proj_b": _j(mha.out_proj.bias),
        }
        jmask = jnp.triu(jnp.full((t, t), -jnp.inf), k=1)
        got = clip_text._attention(_j(x), p, jmask)
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


class TestBertParity:
    def test_full_encoder_vs_hf(self):
        transformers = pytest.importorskip("transformers")
        torch.manual_seed(8)
        hf_cfg = transformers.BertConfig(
            vocab_size=96, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=48,
            max_position_embeddings=24, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        )
        hf = transformers.BertModel(hf_cfg).eval()
        cfg = bert_lib.BertConfig(
            vocab=96, hidden=32, layers=2, heads=4, ffn=48, max_pos=24
        )
        sd = {k: v.numpy() for k, v in hf.state_dict().items()}
        params = bert_lib.convert_hf_state_dict(sd, prefix="", cfg=cfg)

        rng = np.random.default_rng(3)
        ids = rng.integers(5, 96, size=(2, 9))
        mask = np.ones((2, 9), np.int64)
        mask[1, 7:] = 0
        with torch.no_grad():
            want = hf(
                input_ids=torch.from_numpy(ids),
                attention_mask=torch.from_numpy(mask),
            ).last_hidden_state.numpy()
        got = np.asarray(
            bert_lib.forward(
                params, cfg, jnp.asarray(ids), jnp.asarray(mask, jnp.float32)
            )
        )
        np.testing.assert_allclose(got[0], want[0], atol=1e-4)
        np.testing.assert_allclose(got[1, :7], want[1, :7], atol=1e-4)


class TestClipFullTowerParity:
    def test_encode_tokens_matches_hf_clip_text_model(self):
        """Full ViT-B/32 text tower vs transformers.CLIPTextModelWithProjection
        on random weights: proves convert_openai_state_dict's layout (the HF
        state dict is re-keyed into openai naming, the converter's input
        format) and encode_tokens end to end (causal mask, quick-gelu,
        EOT pooling, text projection)."""
        transformers = pytest.importorskip("transformers")
        torch.manual_seed(9)
        cfg = transformers.CLIPTextConfig(  # defaults ARE ViT-B/32 text
            bos_token_id=49406, eos_token_id=49407,
        )
        assert (cfg.hidden_size, cfg.num_hidden_layers, cfg.num_attention_heads) == (
            512, 12, 8,
        )
        hf = transformers.CLIPTextModelWithProjection(cfg).eval()

        # re-key HF weights into the openai-clip naming our converter reads
        hsd = hf.state_dict()
        sd = {
            "token_embedding.weight":
                hsd["text_model.embeddings.token_embedding.weight"],
            "positional_embedding":
                hsd["text_model.embeddings.position_embedding.weight"],
            "ln_final.weight": hsd["text_model.final_layer_norm.weight"],
            "ln_final.bias": hsd["text_model.final_layer_norm.bias"],
            "text_projection": hsd["text_projection.weight"].T,
        }
        for i in range(12):
            h = f"text_model.encoder.layers.{i}"
            o = f"transformer.resblocks.{i}"
            sd[f"{o}.ln_1.weight"] = hsd[f"{h}.layer_norm1.weight"]
            sd[f"{o}.ln_1.bias"] = hsd[f"{h}.layer_norm1.bias"]
            sd[f"{o}.ln_2.weight"] = hsd[f"{h}.layer_norm2.weight"]
            sd[f"{o}.ln_2.bias"] = hsd[f"{h}.layer_norm2.bias"]
            sd[f"{o}.attn.in_proj_weight"] = torch.cat(
                [hsd[f"{h}.self_attn.{p}_proj.weight"] for p in "qkv"], dim=0
            )
            sd[f"{o}.attn.in_proj_bias"] = torch.cat(
                [hsd[f"{h}.self_attn.{p}_proj.bias"] for p in "qkv"], dim=0
            )
            sd[f"{o}.attn.out_proj.weight"] = hsd[f"{h}.self_attn.out_proj.weight"]
            sd[f"{o}.attn.out_proj.bias"] = hsd[f"{h}.self_attn.out_proj.bias"]
            sd[f"{o}.mlp.c_fc.weight"] = hsd[f"{h}.mlp.fc1.weight"]
            sd[f"{o}.mlp.c_fc.bias"] = hsd[f"{h}.mlp.fc1.bias"]
            sd[f"{o}.mlp.c_proj.weight"] = hsd[f"{h}.mlp.fc2.weight"]
            sd[f"{o}.mlp.c_proj.bias"] = hsd[f"{h}.mlp.fc2.bias"]
        params = clip_text.convert_openai_state_dict(
            {k: v.numpy() for k, v in sd.items()}
        )

        # openai-style token row: BOT prompt EOT then zero padding; EOT is
        # the max id so openai argmax pooling == HF eos-position pooling
        tokens = np.zeros((2, 77), np.int64)
        tokens[0, :5] = [49406, 320, 1125, 539, 49407]
        tokens[1, :7] = [49406, 786, 1126, 940, 23, 7, 49407]
        with torch.no_grad():
            want = hf(input_ids=torch.from_numpy(tokens)).text_embeds.numpy()
        got = np.asarray(clip_text.encode_tokens(params, jnp.asarray(tokens)))
        np.testing.assert_allclose(got, want, atol=2e-4)


class TestGhiasiFullModelParity:
    """Full Ghiasi transformer vs a functional torch mirror of the
    published architecture (Ghiasi et al. 2017; reference
    text/subnetworks/ghiasi_img_transformer.py:15-220): reflection-pad
    convs + instance norm, FiLM style modulation from Linear(100, C),
    nearest 2x upsampling, final sigmoid. Proves ghiasi_convert +
    models/ghiasi.apply end to end on random weights."""

    @staticmethod
    def _state_dict():
        g = torch.Generator().manual_seed(3)

        def t(*shape, scale=0.2):
            return torch.randn(*shape, generator=g) * scale

        sd = {}
        enc = [(0, 3, 32, 9), (1, 32, 64, 3), (2, 64, 128, 3)]
        for i, cin, cout, k in enc:
            sd[f"layers.{i}.conv.weight"] = t(cout, cin, k, k)
            sd[f"layers.{i}.conv.bias"] = t(cout)
        for i in range(3, 8):
            for c in ("conv1", "conv2"):
                sd[f"layers.{i}.{c}.weight"] = t(128, 128, 3, 3)
                sd[f"layers.{i}.{c}.bias"] = t(128)
            for fc in ("fc_gamma1", "fc_beta1", "fc_gamma2", "fc_beta2"):
                sd[f"layers.{i}.{fc}.weight"] = t(128, 100)
                sd[f"layers.{i}.{fc}.bias"] = t(128)
        dec = [(8, 128, 64, 3), (9, 64, 32, 3), (10, 32, 3, 9)]
        for i, cin, cout, k in dec:
            sd[f"layers.{i}.conv.weight"] = t(cout, cin, k, k)
            sd[f"layers.{i}.conv.bias"] = t(cout)
            sd[f"layers.{i}.fc_gamma.weight"] = t(cout, 100)
            sd[f"layers.{i}.fc_gamma.bias"] = t(cout)
            sd[f"layers.{i}.fc_beta.weight"] = t(cout, 100)
            sd[f"layers.{i}.fc_beta.bias"] = t(cout)
        return sd

    @staticmethod
    def _torch_forward(sd, x, style):
        def conv(x, pre, stride, k):
            x = F.pad(x, (k // 2,) * 4, mode="reflect")
            return F.conv2d(x, sd[f"{pre}.weight"], sd[f"{pre}.bias"], stride)

        def film(x, pre, style):
            gamma = style @ sd[f"{pre}.fc_gamma.weight"].T + sd[f"{pre}.fc_gamma.bias"]
            beta = style @ sd[f"{pre}.fc_beta.weight"].T + sd[f"{pre}.fc_beta.bias"]
            return gamma[:, :, None, None] * x + beta[:, :, None, None]

        inorm = F.instance_norm
        for i, stride, k in ((0, 1, 9), (1, 2, 3), (2, 2, 3)):
            x = F.relu(inorm(conv(x, f"layers.{i}.conv", stride, k)))
        for i in range(3, 8):
            p = f"layers.{i}"
            y = inorm(conv(x, f"{p}.conv1", 1, 3))
            g1 = style @ sd[f"{p}.fc_gamma1.weight"].T + sd[f"{p}.fc_gamma1.bias"]
            b1 = style @ sd[f"{p}.fc_beta1.weight"].T + sd[f"{p}.fc_beta1.bias"]
            y = F.relu(g1[:, :, None, None] * y + b1[:, :, None, None])
            y = inorm(conv(y, f"{p}.conv2", 1, 3))
            g2 = style @ sd[f"{p}.fc_gamma2.weight"].T + sd[f"{p}.fc_gamma2.bias"]
            b2 = style @ sd[f"{p}.fc_beta2.weight"].T + sd[f"{p}.fc_beta2.bias"]
            x = x + g2[:, :, None, None] * y + b2[:, :, None, None]
        for i, up, k, act in ((8, True, 3, True), (9, True, 3, True), (10, False, 9, False)):
            p = f"layers.{i}"
            if up:
                x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = film(inorm(conv(x, f"{p}.conv", 1, k)), p, style)
            if act:
                x = F.relu(x)
        return torch.sigmoid(x)

    def test_full_forward_matches(self):
        from tbist_tpu.models import ghiasi
        from tbist_tpu.weights import ghiasi_convert

        sd = self._state_dict()
        torch.manual_seed(4)
        x = torch.rand(2, 3, 32, 32)
        style = torch.randn(2, 100) * 0.5
        with torch.no_grad():
            want = self._torch_forward(sd, x, style).numpy()

        params = ghiasi_convert.convert_ghiasi(
            {k: v.numpy() for k, v in sd.items()}
        )
        got = np.asarray(
            ghiasi.apply(
                params,
                _j(x.permute(0, 2, 3, 1)),
                _j(style),
            )
        ).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, atol=5e-5)


class TestDepthAnythingFullModelParity:
    """Full DINOv2 encoder + DPT neck/head vs a tiny random
    transformers.DepthAnythingForDepthEstimation. Certifies
    convert_hf_state_dict + encode + depth_head end to end (backbone
    final-LN tapping, fusion layer ordering, align_corners=True
    interpolations, transposed-conv layout)."""

    def _models(self):
        transformers = pytest.importorskip("transformers")

        from tbist_tpu.models import depth_anything as da

        torch.manual_seed(11)
        backbone = transformers.Dinov2Config(
            hidden_size=32, num_hidden_layers=4, num_attention_heads=4,
            mlp_ratio=2, patch_size=14, image_size=56,
            out_indices=[1, 2, 3, 4], reshape_hidden_states=False,
        )
        hf_cfg = transformers.DepthAnythingConfig(
            backbone_config=backbone, patch_size=14,
            reassemble_hidden_size=32, reassemble_factors=[4, 2, 1, 0.5],
            neck_hidden_sizes=[8, 16, 32, 32], fusion_hidden_size=16,
            head_hidden_size=8,
        )
        hf = transformers.DepthAnythingForDepthEstimation(hf_cfg).eval()
        cfg = da.DAConfig(
            patch=14, width=32, layers=4, heads=4, mlp_ratio=2,
            out_layers=(1, 2, 3, 4), neck_dims=(8, 16, 32, 32), fusion=16,
            head_hidden=8, pos_grid=4, input_size=56,
        )
        sd = {k: v.numpy() for k, v in hf.state_dict().items()}
        params = da.convert_hf_state_dict(sd, cfg)
        return hf, cfg, params, da

    def test_predicted_depth_matches(self):
        hf, cfg, params, da = self._models()
        rng = np.random.default_rng(7)
        x = rng.standard_normal((1, 56, 56, 3)).astype(np.float32) * 0.5
        with torch.no_grad():
            want = hf(
                pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2))
            ).predicted_depth.numpy()  # (1, 56, 56)

        hidden = da.encode(params, cfg, jnp.asarray(x))
        got = np.asarray(
            da.depth_head(params, cfg, hidden, (4, 4), (56, 56))
        )
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestSwinFullModelParity:
    """Full tiny Swin vs transformers.SwinModel: patch embed, shifted
    windows, patch-merging concat order, relative bias, final layernorm.
    HF weights are re-keyed into the official (GroundingDINO) naming that
    swin.convert_torch_state_dict reads, so the converter is on the path."""

    def test_last_stage_features_match(self):
        transformers = pytest.importorskip("transformers")

        from tbist_tpu.models import swin as swin_mod

        torch.manual_seed(12)
        # image 64 keeps every stage grid LARGER than the window: at
        # grid == window HF's classification Swin disables the shift while
        # the detection Swin (used by GroundingDINO, what we implement)
        # keeps shifting with the wraparound mask — a real variant
        # difference, not a bug
        hf_cfg = transformers.SwinConfig(
            image_size=64, patch_size=4, embed_dim=16, depths=[2, 2],
            num_heads=[2, 4], window_size=4, mlp_ratio=2.0,
            drop_path_rate=0.0, use_absolute_embeddings=False,
        )
        hf = transformers.SwinModel(hf_cfg, add_pooling_layer=False).eval()
        hsd = hf.state_dict()

        # re-key HF naming -> official Swin naming (what GroundingDINO
        # checkpoints use and our converter expects)
        sd = {
            "patch_embed.proj.weight": hsd["embeddings.patch_embeddings.projection.weight"],
            "patch_embed.proj.bias": hsd["embeddings.patch_embeddings.projection.bias"],
            "patch_embed.norm.weight": hsd["embeddings.norm.weight"],
            "patch_embed.norm.bias": hsd["embeddings.norm.bias"],
            # our tap point for the last stage == where HF applies its
            # final layernorm; expose it as the stage-1 out-norm
            "norm1.weight": hsd["layernorm.weight"],
            "norm1.bias": hsd["layernorm.bias"],
        }
        for s, depth in enumerate([2, 2]):
            for b in range(depth):
                h = f"encoder.layers.{s}.blocks.{b}"
                o = f"layers.{s}.blocks.{b}"
                sd[f"{o}.norm1.weight"] = hsd[f"{h}.layernorm_before.weight"]
                sd[f"{o}.norm1.bias"] = hsd[f"{h}.layernorm_before.bias"]
                sd[f"{o}.norm2.weight"] = hsd[f"{h}.layernorm_after.weight"]
                sd[f"{o}.norm2.bias"] = hsd[f"{h}.layernorm_after.bias"]
                sd[f"{o}.attn.qkv.weight"] = torch.cat(
                    [hsd[f"{h}.attention.self.{p}.weight"] for p in ("query", "key", "value")], 0
                )
                sd[f"{o}.attn.qkv.bias"] = torch.cat(
                    [hsd[f"{h}.attention.self.{p}.bias"] for p in ("query", "key", "value")], 0
                )
                sd[f"{o}.attn.proj.weight"] = hsd[f"{h}.attention.output.dense.weight"]
                sd[f"{o}.attn.proj.bias"] = hsd[f"{h}.attention.output.dense.bias"]
                sd[f"{o}.attn.relative_position_bias_table"] = hsd[
                    f"{h}.attention.self.relative_position_bias_table"
                ]
                sd[f"{o}.mlp.fc1.weight"] = hsd[f"{h}.intermediate.dense.weight"]
                sd[f"{o}.mlp.fc1.bias"] = hsd[f"{h}.intermediate.dense.bias"]
                sd[f"{o}.mlp.fc2.weight"] = hsd[f"{h}.output.dense.weight"]
                sd[f"{o}.mlp.fc2.bias"] = hsd[f"{h}.output.dense.bias"]
        sd["layers.0.downsample.reduction.weight"] = hsd[
            "encoder.layers.0.downsample.reduction.weight"
        ]
        sd["layers.0.downsample.norm.weight"] = hsd["encoder.layers.0.downsample.norm.weight"]
        sd["layers.0.downsample.norm.bias"] = hsd["encoder.layers.0.downsample.norm.bias"]

        cfg = swin_mod.SwinConfig(
            embed_dim=16, depths=(2, 2), heads=(2, 4), window=4,
            mlp_ratio=2, out_indices=(1,),
        )
        params = swin_mod.convert_torch_state_dict(
            {k: v.numpy() for k, v in sd.items()}, prefix="", cfg=cfg
        )

        rng = np.random.default_rng(8)
        x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32) * 0.5
        with torch.no_grad():
            want = hf(
                pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2))
            ).last_hidden_state.numpy()  # (B, tokens, C) after final LN
        outs = swin_mod.forward(params, cfg, jnp.asarray(x))
        got = np.asarray(outs[0]).reshape(1, -1, want.shape[-1])
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestSamFullModelParity:
    """Full tiny SAM vs transformers.SamModel: windowed/global rel-pos ViT
    encoder + neck, box prompt encoding (+0.5 pixel-center shift), two-way
    decoder, upscaling and hypernetwork. HF weights are re-keyed into the
    original segment_anything naming that convert_sam_state_dict reads."""

    def _models(self):
        transformers = pytest.importorskip("transformers")

        from tbist_tpu.models import sam as sam_mod

        torch.manual_seed(13)
        hf_cfg = transformers.SamConfig(
            vision_config=dict(
                hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                image_size=64, patch_size=8, window_size=4,
                global_attn_indexes=[1], output_channels=32, mlp_dim=64,
                num_pos_feats=16,  # PE dim = 2*16 = decoder hidden 32
            ),
            prompt_encoder_config=dict(
                hidden_size=32, image_size=64, patch_size=8,
                mask_input_channels=4,  # -> image_embedding_size 64/8 = 8
            ),
            mask_decoder_config=dict(
                hidden_size=32, num_attention_heads=4, mlp_dim=64,
                iou_head_hidden_dim=16,
            ),
        )
        hf = transformers.SamModel(hf_cfg).eval()
        hsd = hf.state_dict()

        ren = {}  # HF name -> original segment_anything name
        ren["vision_encoder.patch_embed.projection.weight"] = "image_encoder.patch_embed.proj.weight"
        ren["vision_encoder.patch_embed.projection.bias"] = "image_encoder.patch_embed.proj.bias"
        ren["vision_encoder.pos_embed"] = "image_encoder.pos_embed"
        for i in range(2):
            h, o = f"vision_encoder.layers.{i}", f"image_encoder.blocks.{i}"
            for a, b in [
                ("layer_norm1", "norm1"), ("layer_norm2", "norm2"),
                ("attn.qkv", "attn.qkv"), ("attn.proj", "attn.proj"),
                ("mlp.lin1", "mlp.lin1"), ("mlp.lin2", "mlp.lin2"),
            ]:
                ren[f"{h}.{a}.weight"] = f"{o}.{b}.weight"
                ren[f"{h}.{a}.bias"] = f"{o}.{b}.bias"
            ren[f"{h}.attn.rel_pos_h"] = f"{o}.attn.rel_pos_h"
            ren[f"{h}.attn.rel_pos_w"] = f"{o}.attn.rel_pos_w"
        ren["vision_encoder.neck.conv1.weight"] = "image_encoder.neck.0.weight"
        ren["vision_encoder.neck.layer_norm1.weight"] = "image_encoder.neck.1.weight"
        ren["vision_encoder.neck.layer_norm1.bias"] = "image_encoder.neck.1.bias"
        ren["vision_encoder.neck.conv2.weight"] = "image_encoder.neck.2.weight"
        ren["vision_encoder.neck.layer_norm2.weight"] = "image_encoder.neck.3.weight"
        ren["vision_encoder.neck.layer_norm2.bias"] = "image_encoder.neck.3.bias"
        ren["shared_image_embedding.positional_embedding"] = (
            "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"
        )
        for i in range(4):
            ren[f"prompt_encoder.point_embed.{i}.weight"] = (
                f"prompt_encoder.point_embeddings.{i}.weight"
            )
        ren["prompt_encoder.no_mask_embed.weight"] = "prompt_encoder.no_mask_embed.weight"
        ren["mask_decoder.iou_token.weight"] = "mask_decoder.iou_token.weight"
        ren["mask_decoder.mask_tokens.weight"] = "mask_decoder.mask_tokens.weight"
        for i in range(2):
            h = f"mask_decoder.transformer.layers.{i}"
            for attn in ("self_attn", "cross_attn_token_to_image", "cross_attn_image_to_token"):
                for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
                    ren[f"{h}.{attn}.{p}.weight"] = f"{h}.{attn}.{p}.weight"
                    ren[f"{h}.{attn}.{p}.bias"] = f"{h}.{attn}.{p}.bias"
            for j in range(1, 5):
                ren[f"{h}.layer_norm{j}.weight"] = f"{h}.norm{j}.weight"
                ren[f"{h}.layer_norm{j}.bias"] = f"{h}.norm{j}.bias"
            ren[f"{h}.mlp.lin1.weight"] = f"{h}.mlp.lin1.weight"
            ren[f"{h}.mlp.lin1.bias"] = f"{h}.mlp.lin1.bias"
            ren[f"{h}.mlp.lin2.weight"] = f"{h}.mlp.lin2.weight"
            ren[f"{h}.mlp.lin2.bias"] = f"{h}.mlp.lin2.bias"
        for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
            ren[f"mask_decoder.transformer.final_attn_token_to_image.{p}.weight"] = (
                f"mask_decoder.transformer.final_attn_token_to_image.{p}.weight"
            )
            ren[f"mask_decoder.transformer.final_attn_token_to_image.{p}.bias"] = (
                f"mask_decoder.transformer.final_attn_token_to_image.{p}.bias"
            )
        ren["mask_decoder.transformer.layer_norm_final_attn.weight"] = (
            "mask_decoder.transformer.norm_final_attn.weight"
        )
        ren["mask_decoder.transformer.layer_norm_final_attn.bias"] = (
            "mask_decoder.transformer.norm_final_attn.bias"
        )
        ren["mask_decoder.upscale_conv1.weight"] = "mask_decoder.output_upscaling.0.weight"
        ren["mask_decoder.upscale_conv1.bias"] = "mask_decoder.output_upscaling.0.bias"
        ren["mask_decoder.upscale_layer_norm.weight"] = "mask_decoder.output_upscaling.1.weight"
        ren["mask_decoder.upscale_layer_norm.bias"] = "mask_decoder.output_upscaling.1.bias"
        ren["mask_decoder.upscale_conv2.weight"] = "mask_decoder.output_upscaling.3.weight"
        ren["mask_decoder.upscale_conv2.bias"] = "mask_decoder.output_upscaling.3.bias"
        for t in range(4):
            h = f"mask_decoder.output_hypernetworks_mlps.{t}"
            o = f"mask_decoder.output_hypernetworks_mlps.{t}"
            ren[f"{h}.proj_in.weight"] = f"{o}.layers.0.weight"
            ren[f"{h}.proj_in.bias"] = f"{o}.layers.0.bias"
            ren[f"{h}.layers.0.weight"] = f"{o}.layers.1.weight"
            ren[f"{h}.layers.0.bias"] = f"{o}.layers.1.bias"
            ren[f"{h}.proj_out.weight"] = f"{o}.layers.2.weight"
            ren[f"{h}.proj_out.bias"] = f"{o}.layers.2.bias"

        sd = {new: hsd[old].numpy() for old, new in ren.items()}
        cfg = sam_mod.SamConfig(
            img_size=64, patch=8, width=32, layers=2, heads=4, window=4,
            global_layers=(1,), embed_dim=32, decoder_heads=4,
            decoder_layers=2, mlp_dim=64, num_mask_tokens=4,
        )
        params = sam_mod.convert_sam_state_dict(sd, cfg)
        return hf, cfg, params, sam_mod

    def test_vision_encoder_matches(self):
        hf, cfg, params, sam_mod = self._models()
        rng = np.random.default_rng(9)
        x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32) * 0.5
        with torch.no_grad():
            want = hf.vision_encoder(
                torch.from_numpy(x.transpose(0, 3, 1, 2))
            ).last_hidden_state.numpy()  # (1, C, 8, 8)
        got = np.asarray(sam_mod.encode_image(params, cfg, jnp.asarray(x)))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-4)

    def test_box_to_mask_logits_match(self):
        hf, cfg, params, sam_mod = self._models()
        rng = np.random.default_rng(10)
        x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32) * 0.5
        boxes = np.asarray([[[8.0, 12.0, 44.0, 52.0]]], np.float32)  # (1,1,4)
        with torch.no_grad():
            out = hf(
                pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2)),
                input_boxes=torch.from_numpy(boxes),
                multimask_output=False,
            )
        want = out.pred_masks.numpy()[0, 0, 0]  # (32, 32) low-res logits

        emb = sam_mod.encode_image(params, cfg, jnp.asarray(x))
        boxes01 = (boxes[0] + 0.5) / cfg.img_size  # pixel-center shift
        got = np.asarray(
            sam_mod.decode_masks(params, cfg, emb, jnp.asarray(boxes01))
        )[0]
        np.testing.assert_allclose(got, want, atol=2e-4)


class TestSubSentenceTextMasks:
    """build_text_token_masks vs the authoritative HF implementation
    (generate_masks_with_special_tokens_and_transfer_map), which mirrors the
    official groundingdino function the reference model runs on every
    prompt (text/subnetworks/groundingdino_text_object_detector.py:74)."""

    def test_matches_hf_reference(self):
        gd = pytest.importorskip(
            "transformers.models.grounding_dino.modeling_grounding_dino"
        )
        cases = [
            [101, 5, 6, 1012, 102],                 # [CLS] w w . [SEP]
            [101, 5, 1012, 7, 8, 1012, 102],        # two sub-sentences
            [101, 5, 6, 7, 102],                    # no interior special
            [101, 1012, 1012, 102],                 # adjacent specials
            [5, 6, 1012, 7],                        # no [CLS]/[SEP]
            [101, 5, 6, 102, 8, 9, 1029, 102],      # '?' separator
        ]
        for ids in cases:
            want_attn, want_pos = (
                gd.generate_masks_with_special_tokens_and_transfer_map(
                    torch.tensor([ids])
                )
            )
            got_attn, got_pos = dino_lib.build_text_token_masks(
                jnp.asarray([ids], jnp.int32)
            )
            np.testing.assert_array_equal(
                np.asarray(got_attn), want_attn.numpy(), err_msg=str(ids)
            )
            np.testing.assert_array_equal(
                np.asarray(got_pos), want_pos.numpy(), err_msg=str(ids)
            )


class TestGroundingDinoFullModelParity:
    """Full tiny GroundingDINO vs transformers.GroundingDinoForObjectDetection:
    Swin backbone + input projections + GroupNorm, BERT with sub-sentence
    masks and restarted position ids, fusion (normed residuals) /
    text-enhancer / deformable encoder layers, language-guided query
    selection with proposal-validity masking, decoder with iterative box
    refinement, and the final contrastive-logits + normed-hidden box head.
    HF weights are re-keyed into the official groundingdino checkpoint
    naming that weights/dino_convert.convert reads, so the production
    converter is on the tested path end to end."""

    DEPTHS = (1, 1, 1, 1)
    ENC = DEC = 2

    def _models(self):
        transformers = pytest.importorskip("transformers")

        from tbist_tpu.weights import dino_convert

        torch.manual_seed(20)
        backbone = transformers.SwinConfig(
            image_size=128, patch_size=4, embed_dim=8, depths=list(self.DEPTHS),
            num_heads=[1, 2, 4, 8], window_size=4, mlp_ratio=2.0,
            drop_path_rate=0.0, use_absolute_embeddings=False,
            out_features=["stage2", "stage3", "stage4"],
        )
        text = transformers.BertConfig(
            vocab_size=1100, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=64, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        )
        hf_cfg = transformers.GroundingDinoConfig(
            backbone_config=backbone, text_config=text,
            d_model=32, encoder_layers=self.ENC, decoder_layers=self.DEC,
            encoder_attention_heads=2, decoder_attention_heads=2,
            encoder_ffn_dim=64, decoder_ffn_dim=64, num_queries=20,
            num_feature_levels=4, encoder_n_points=2, decoder_n_points=2,
            dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
            fusion_dropout=0.0, fusion_droppath=0.0, text_enhancer_dropout=0.0,
            disable_custom_kernels=True,
        )
        hf = transformers.GroundingDinoForObjectDetection(hf_cfg).eval()

        dcfg = dino_lib.DinoConfig(
            d_model=32, heads=2, levels=4, points=2, enc_layers=self.ENC,
            dec_layers=self.DEC, ffn=64, num_queries=20, fusion_heads=1,
            fusion_dim=32,
        )
        swin_cfg = swin_lib.SwinConfig(
            embed_dim=8, depths=self.DEPTHS, heads=(1, 2, 4, 8), window=4,
            mlp_ratio=2, out_indices=(1, 2, 3),
        )
        bert_cfg = bert_lib.BertConfig(
            vocab=1100, hidden=32, layers=2, heads=2, ffn=64, max_pos=64
        )
        sd = self._rekey(hf.state_dict())
        params = dino_convert.convert(
            {k: v.numpy() for k, v in sd.items()}, dcfg, swin_cfg, bert_cfg
        )
        return hf, dcfg, swin_cfg, bert_cfg, params

    def _rekey(self, hsd):
        """HF GroundingDino state-dict -> official groundingdino naming."""
        sd = {}
        sw = "model.backbone.conv_encoder.model."
        sd["backbone.0.patch_embed.proj.weight"] = hsd[
            sw + "embeddings.patch_embeddings.projection.weight"
        ]
        sd["backbone.0.patch_embed.proj.bias"] = hsd[
            sw + "embeddings.patch_embeddings.projection.bias"
        ]
        sd["backbone.0.patch_embed.norm.weight"] = hsd[sw + "embeddings.norm.weight"]
        sd["backbone.0.patch_embed.norm.bias"] = hsd[sw + "embeddings.norm.bias"]
        for s, depth in enumerate(self.DEPTHS):
            for b in range(depth):
                h = f"{sw}encoder.layers.{s}.blocks.{b}"
                o = f"backbone.0.layers.{s}.blocks.{b}"
                sd[f"{o}.norm1.weight"] = hsd[f"{h}.layernorm_before.weight"]
                sd[f"{o}.norm1.bias"] = hsd[f"{h}.layernorm_before.bias"]
                sd[f"{o}.norm2.weight"] = hsd[f"{h}.layernorm_after.weight"]
                sd[f"{o}.norm2.bias"] = hsd[f"{h}.layernorm_after.bias"]
                sd[f"{o}.attn.qkv.weight"] = torch.cat(
                    [hsd[f"{h}.attention.self.{p}.weight"]
                     for p in ("query", "key", "value")], 0
                )
                sd[f"{o}.attn.qkv.bias"] = torch.cat(
                    [hsd[f"{h}.attention.self.{p}.bias"]
                     for p in ("query", "key", "value")], 0
                )
                sd[f"{o}.attn.proj.weight"] = hsd[f"{h}.attention.output.dense.weight"]
                sd[f"{o}.attn.proj.bias"] = hsd[f"{h}.attention.output.dense.bias"]
                sd[f"{o}.attn.relative_position_bias_table"] = hsd[
                    f"{h}.attention.self.relative_position_bias_table"
                ]
                sd[f"{o}.mlp.fc1.weight"] = hsd[f"{h}.intermediate.dense.weight"]
                sd[f"{o}.mlp.fc1.bias"] = hsd[f"{h}.intermediate.dense.bias"]
                sd[f"{o}.mlp.fc2.weight"] = hsd[f"{h}.output.dense.weight"]
                sd[f"{o}.mlp.fc2.bias"] = hsd[f"{h}.output.dense.bias"]
            if s < len(self.DEPTHS) - 1:
                h = f"{sw}encoder.layers.{s}.downsample"
                o = f"backbone.0.layers.{s}.downsample"
                sd[f"{o}.reduction.weight"] = hsd[f"{h}.reduction.weight"]
                sd[f"{o}.norm.weight"] = hsd[f"{h}.norm.weight"]
                sd[f"{o}.norm.bias"] = hsd[f"{h}.norm.bias"]
        for i, stage in enumerate(["stage2", "stage3", "stage4"], start=1):
            sd[f"backbone.0.norm{i}.weight"] = hsd[
                f"{sw}hidden_states_norms.{stage}.weight"
            ]
            sd[f"backbone.0.norm{i}.bias"] = hsd[
                f"{sw}hidden_states_norms.{stage}.bias"
            ]

        for k, v in hsd.items():
            if k.startswith("model.text_backbone."):
                sd["bert." + k[len("model.text_backbone."):]] = v
        sd["feat_map.weight"] = hsd["model.text_projection.weight"]
        sd["feat_map.bias"] = hsd["model.text_projection.bias"]
        for i in range(4):
            for j in (0, 1):
                for p in ("weight", "bias"):
                    sd[f"input_proj.{i}.{j}.{p}"] = hsd[
                        f"model.input_proj_vision.{i}.{j}.{p}"
                    ]
        sd["transformer.level_embed"] = hsd["model.level_embed"]

        def packed_mha(dst, src):
            sd[f"{dst}.in_proj_weight"] = torch.cat(
                [hsd[f"{src}.{p}.weight"] for p in ("query", "key", "value")], 0
            )
            sd[f"{dst}.in_proj_bias"] = torch.cat(
                [hsd[f"{src}.{p}.bias"] for p in ("query", "key", "value")], 0
            )
            sd[f"{dst}.out_proj.weight"] = hsd[f"{src}.out_proj.weight"]
            sd[f"{dst}.out_proj.bias"] = hsd[f"{src}.out_proj.bias"]

        def wb(dst, src):
            sd[f"{dst}.weight"] = hsd[f"{src}.weight"]
            sd[f"{dst}.bias"] = hsd[f"{src}.bias"]

        for i in range(self.ENC):
            h = f"model.encoder.layers.{i}"
            f_ = f"transformer.encoder.fusion_layers.{i}"
            wb(f"{f_}.layer_norm_v", f"{h}.fusion_layer.layer_norm_vision")
            wb(f"{f_}.layer_norm_l", f"{h}.fusion_layer.layer_norm_text")
            for a, b in (
                ("v_proj", "vision_proj"), ("l_proj", "text_proj"),
                ("values_v_proj", "values_vision_proj"),
                ("values_l_proj", "values_text_proj"),
                ("out_v_proj", "out_vision_proj"),
                ("out_l_proj", "out_text_proj"),
            ):
                wb(f"{f_}.attn.{a}", f"{h}.fusion_layer.attn.{b}")
            sd[f"{f_}.gamma_v"] = hsd[f"{h}.fusion_layer.vision_param"]
            sd[f"{f_}.gamma_l"] = hsd[f"{h}.fusion_layer.text_param"]

            tl = f"transformer.encoder.text_layers.{i}"
            te = f"{h}.text_enhancer_layer"
            packed_mha(f"{tl}.self_attn", f"{te}.self_attn")
            wb(f"{tl}.norm1", f"{te}.layer_norm_before")
            wb(f"{tl}.norm2", f"{te}.layer_norm_after")
            wb(f"{tl}.linear1", f"{te}.fc1")
            wb(f"{tl}.linear2", f"{te}.fc2")

            el = f"transformer.encoder.layers.{i}"
            de = f"{h}.deformable_layer"
            for p in ("sampling_offsets", "attention_weights", "value_proj",
                      "output_proj"):
                wb(f"{el}.self_attn.{p}", f"{de}.self_attn.{p}")
            wb(f"{el}.norm1", f"{de}.self_attn_layer_norm")
            wb(f"{el}.linear1", f"{de}.fc1")
            wb(f"{el}.linear2", f"{de}.fc2")
            wb(f"{el}.norm2", f"{de}.final_layer_norm")

        for i in range(self.DEC):
            h = f"model.decoder.layers.{i}"
            dl = f"transformer.decoder.layers.{i}"
            packed_mha(f"{dl}.self_attn", f"{h}.self_attn")
            packed_mha(f"{dl}.ca_text", f"{h}.encoder_attn_text")
            for p in ("sampling_offsets", "attention_weights", "value_proj",
                      "output_proj"):
                wb(f"{dl}.cross_attn.{p}", f"{h}.encoder_attn.{p}")
            wb(f"{dl}.norm2", f"{h}.self_attn_layer_norm")
            wb(f"{dl}.catext_norm", f"{h}.encoder_attn_text_layer_norm")
            wb(f"{dl}.norm1", f"{h}.encoder_attn_layer_norm")
            wb(f"{dl}.norm3", f"{h}.final_layer_norm")
            wb(f"{dl}.linear1", f"{h}.fc1")
            wb(f"{dl}.linear2", f"{h}.fc2")

        for j in range(2):
            wb(f"transformer.decoder.ref_point_head.layers.{j}",
               f"model.decoder.reference_points_head.layers.{j}")
        wb("transformer.decoder.norm", "model.decoder.layer_norm")
        wb("transformer.enc_output", "model.enc_output")
        wb("transformer.enc_output_norm", "model.enc_output_norm")
        for j in range(3):
            wb(f"transformer.enc_out_bbox_embed.layers.{j}",
               f"model.encoder_output_bbox_embed.layers.{j}")
            wb(f"bbox_embed.0.layers.{j}", f"bbox_embed.0.layers.{j}")
        sd["transformer.tgt_embed.weight"] = hsd[
            "model.query_position_embeddings.weight"
        ]
        return sd

    def test_logits_and_boxes_match(self):
        hf, dcfg, swin_cfg, bert_cfg, params = self._models()
        rng = np.random.default_rng(21)
        x = rng.standard_normal((1, 128, 128, 3)).astype(np.float32) * 0.5
        ids = np.array([[101, 40, 41, 1012, 102]], np.int64)  # [CLS] w w . [SEP]
        with torch.no_grad():
            out = hf(
                pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2)),
                input_ids=torch.from_numpy(ids),
                attention_mask=torch.ones_like(torch.from_numpy(ids)),
            )
        want_logits = out.logits[:, :, : ids.shape[1]].numpy()  # (1, 20, 5)
        want_boxes = out.pred_boxes.numpy()  # (1, 20, 4)

        got = dino_lib.forward(
            params, dcfg, jnp.asarray(x), jnp.asarray(ids, jnp.int32),
            jnp.ones_like(jnp.asarray(ids, jnp.int32)), swin_cfg, bert_cfg,
        )
        np.testing.assert_allclose(
            np.asarray(got["pred_boxes"]), want_boxes, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(got["pred_logits"]), want_logits, atol=5e-4
        )
