"""Host-side logic of the DINO+SAM mask extractor (no weights needed)."""

import numpy as np
import pytest

from tbist_tpu.models import dino_sam


class TestDetectionSize:
    def test_short_side_800(self):
        nh, nw = dino_sam._detection_size(480, 640)
        # scale = 800/480 -> (800, 1066) -> bucketed to multiples of 32
        assert nh % 32 == 0 and nw % 32 == 0
        assert abs(nh - 800) <= 16 and abs(nw - 1067) <= 16

    def test_max_size_cap(self):
        nh, nw = dino_sam._detection_size(100, 1000)
        assert max(nh, nw) <= 1333 + 16  # bucket rounding tolerance

    def test_square(self):
        nh, nw = dino_sam._detection_size(512, 512)
        assert nh == nw == 800


class TestWordpiece:
    VOCAB = {
        "[CLS]": 0, "[SEP]": 1, "[UNK]": 2, "boat": 3, ".": 4,
        "sail": 5, "##ing": 6, "a": 7, ",": 8, "cafe": 9, "猫": 10,
        "un": 11, "##afford": 12,
    }

    def test_simple_words(self):
        ids = dino_sam._simple_bert_tokenize("a boat .", self.VOCAB)
        assert ids == [0, 7, 3, 4, 1]

    def test_wordpiece_split(self):
        ids = dino_sam._simple_bert_tokenize("sailing", self.VOCAB)
        assert ids == [0, 5, 6, 1]

    def test_unknown_token(self):
        ids = dino_sam._simple_bert_tokenize("xylophone", self.VOCAB)
        assert ids == [0, 2, 1]

    def test_lowercasing(self):
        ids = dino_sam._simple_bert_tokenize("BOAT", self.VOCAB)
        assert ids == [0, 3, 1]

    def test_punctuation_split(self):
        # The VERDICT bug: detect() appends '.', and HF splits it off the word.
        ids = dino_sam._simple_bert_tokenize("boat.", self.VOCAB)
        assert ids == [0, 3, 4, 1]

    def test_punctuation_interior(self):
        ids = dino_sam._simple_bert_tokenize("boat,sailing.", self.VOCAB)
        assert ids == [0, 3, 8, 5, 6, 4, 1]

    def test_unmatched_tail_makes_whole_word_unk(self):
        # HF semantics: 'unaffordable' matches un ##afford but not ##able
        # -> the ENTIRE word becomes [UNK], not un ##afford [UNK].
        ids = dino_sam._simple_bert_tokenize("unaffordable", self.VOCAB)
        assert ids == [0, 2, 1]

    def test_accent_stripping(self):
        ids = dino_sam._simple_bert_tokenize("café", self.VOCAB)
        assert ids == [0, 9, 1]

    def test_cjk_isolation(self):
        ids = dino_sam._simple_bert_tokenize("猫猫", self.VOCAB)
        assert ids == [0, 10, 10, 1]


class TestHFTokenizerParity:
    """Exact parity with transformers.BertTokenizer on a synthetic vocab."""

    PROMPTS = [
        "boat.",
        "a red BOAT, sailing.",
        "café au lait!",
        "fire 猫 truck...",
        "weird--hyphen's case?",
        "unaffordable things.",
    ]

    def test_matches_hf_bert_tokenizer(self, tmp_path):
        transformers = pytest.importorskip("transformers")
        words = [
            "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
            "boat", ".", ",", "!", "?", "-", "'", "a", "red", "sail",
            "##ing", "cafe", "au", "la", "##it", "fire", "truck", "weird",
            "hyphen", "s", "case", "un", "##afford", "thing", "##s",
        ]
        vocab_file = tmp_path / "vocab.txt"
        vocab_file.write_text("\n".join(words) + "\n")
        hf = transformers.BertTokenizer(
            str(vocab_file), do_lower_case=True, do_basic_tokenize=True
        )
        vocab = {w: i for i, w in enumerate(words)}
        for prompt in self.PROMPTS:
            ours = dino_sam._simple_bert_tokenize(prompt, vocab)
            theirs = hf(prompt)["input_ids"]
            assert ours == theirs, (prompt, ours, theirs)


class TestDecodePhrase:
    """_decode_phrase == transformers.BertTokenizer.decode (the official
    get_phrases_from_posmap returns tokenizer.decode of the kept ids,
    groundingdino_text_object_detector.py:94)."""

    WORDS = [
        "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
        "boat", ".", ",", "!", "?", "'", "sail", "##ing", "red", "thing",
        "##s", "it", "n't", "s",
    ]

    CASES = [
        ["boat"],
        ["boat", "."],
        ["red", "boat", ",", "sail", "##ing", "!"],
        ["thing", "##s"],
        ["sail", "##ing", "thing", "##s", "?"],
        ["it", "'", "s"],
        ["[SEP]"],
    ]

    def test_matches_hf_decode(self, tmp_path):
        transformers = pytest.importorskip("transformers")
        vocab_file = tmp_path / "vocab.txt"
        vocab_file.write_text("\n".join(self.WORDS) + "\n")
        hf = transformers.BertTokenizer(str(vocab_file))
        vocab = {w: i for i, w in enumerate(self.WORDS)}
        inv = {i: w for w, i in vocab.items()}
        for toks in self.CASES:
            ids = [vocab[t] for t in toks]
            assert dino_sam._decode_phrase(ids, inv) == hf.decode(ids), toks


class TestFilterPhrases:
    """Weights-free drive of the posmap phrase filter (the detect() loop
    after BOX_THRESHOLD) on synthetic sigmoid logits."""

    WORDS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "boat", ".", "red"]

    def _setup(self):
        vocab = {w: i for i, w in enumerate(self.WORDS)}
        inv = {i: w for w, i in vocab.items()}
        # prompt 'red boat.' -> [CLS] red boat . [SEP]
        ids = [vocab["[CLS]"], vocab["red"], vocab["boat"], vocab["."],
               vocab["[SEP]"]]
        return ids, inv

    def test_phrase_and_score_format(self):
        ids, inv = self._setup()
        logits = np.zeros((2, len(ids)), np.float32)
        logits[0, 1] = 0.9   # 'red'
        logits[0, 2] = 0.74  # 'boat'
        logits[1, 2] = 0.53  # 'boat' only
        keep, phrases = dino_sam.filter_phrases(logits, ids, inv)
        np.testing.assert_array_equal(keep, [True, True])
        # str(float(np.float32(0.9)))[:4] == '0.89' — same float32->str
        # truncation the reference's .item() path produces
        assert phrases == ["red boat(0.89)", "boat(0.52)"]

    def test_cls_position_always_dropped(self):
        ids, inv = self._setup()
        logits = np.zeros((1, len(ids)), np.float32)
        logits[0, 0] = 0.99  # [CLS]: above threshold, but position 0 is zeroed
        keep, phrases = dino_sam.filter_phrases(logits, ids, inv)
        np.testing.assert_array_equal(keep, [False])
        assert phrases == []

    def test_sep_above_threshold_is_kept_in_phrase(self):
        # official semantics: only [CLS]/>=255 are zeroed; '.' and [SEP]
        # above threshold join the decode (groundingdino:92-100)
        ids, inv = self._setup()
        logits = np.zeros((1, len(ids)), np.float32)
        logits[0, 2] = 0.8  # boat
        logits[0, 3] = 0.6  # '.'
        keep, phrases = dino_sam.filter_phrases(logits, ids, inv)
        assert keep[0] and phrases == ["boat.(0.80)"]

    def test_jax_array_input(self):
        # regression: detect() used to hand filter logic a JAX array whose
        # rows are immutable -> TypeError on token_keep[0] = False
        import jax.numpy as jnp

        ids, inv = self._setup()
        logits = jnp.zeros((1, len(ids)), jnp.float32).at[0, 2].set(0.8)
        keep, phrases = dino_sam.filter_phrases(logits, ids, inv)
        assert keep[0] and phrases == ["boat(0.80)"]

    def test_empty_rows(self):
        ids, inv = self._setup()
        keep, phrases = dino_sam.filter_phrases(
            np.zeros((0, len(ids)), np.float32), ids, inv
        )
        assert keep.shape == (0,) and phrases == []


class TestPreprocessImage:
    def _img(self, h=40, w=60):
        return np.arange(h * w * 3, dtype=np.uint8).reshape(h, w, 3)

    def test_noop_default(self):
        img = self._img()
        out = dino_sam.preprocess_image(img)
        np.testing.assert_array_equal(out, img)

    def test_crop(self):
        out = dino_sam.preprocess_image(self._img(), left=5, right=10, top=2, bottom=3)
        assert out.shape == (40 - 2 - 3, 60 - 5 - 10, 3)
        np.testing.assert_array_equal(out, self._img()[2:37, 5:50])

    def test_square_center_crop(self):
        out = dino_sam.preprocess_image(self._img(40, 60), square=True)
        assert out.shape == (40, 40, 3)
        np.testing.assert_array_equal(out, self._img()[:, 10:50])
        tall = dino_sam.preprocess_image(self._img(60, 40).transpose(0, 1, 2), square=True)
        assert tall.shape[0] == tall.shape[1]

    def test_resize(self):
        out = dino_sam.preprocess_image(self._img(), resize=True, height=16, width=24)
        assert out.shape == (16, 24, 3) and out.dtype == np.uint8

    def test_grayscale_promoted(self):
        g = np.zeros((8, 8), np.uint8)
        out = dino_sam.preprocess_image(g)
        assert out.shape == (8, 8, 3)

    def test_overlarge_crops_clamped(self):
        out = dino_sam.preprocess_image(self._img(10, 10), left=100, top=100)
        assert out.shape[0] >= 1 and out.shape[1] >= 1


class TestExtractorFallback:
    def test_missing_weights_raise(self):
        with pytest.raises(Exception):
            dino_sam.get_mask_extractor.__wrapped__()


class TestOverlappedChainTiny:
    """End-to-end drive of the production extract_mask chain (single
    uint8 upload shared by DINO and SAM, SAM encoder dispatched before
    the host blocks on DINO) with tiny seeded models, checked against
    the sequential detect() + predict_boxes() composition."""

    def test_extract_mask_matches_sequential(self, monkeypatch):
        import jax

        from tbist_tpu.models import bert as bert_lib
        from tbist_tpu.models import dino as dino_lib
        from tbist_tpu.models import sam as sam_lib
        from tbist_tpu.models import swin as swin_lib

        swin_tiny = swin_lib.SwinConfig(
            embed_dim=8, depths=(1, 1, 1, 1), heads=(1, 2, 4, 8), window=4,
            mlp_ratio=2, out_indices=(1, 2, 3),
        )
        bert_tiny = bert_lib.BertConfig(
            vocab=128, hidden=32, layers=2, heads=2, ffn=64, max_pos=64,
            type_vocab=2,
        )
        dino_tiny = dino_lib.DinoConfig(
            d_model=16, heads=2, levels=4, points=2, enc_layers=2,
            dec_layers=2, ffn=32, num_queries=20, fusion_heads=2,
            fusion_dim=32,
        )
        sam_tiny = sam_lib.SamConfig(
            img_size=64, patch=16, width=32, layers=2, heads=2, window=2,
            global_layers=(1,), embed_dim=32, decoder_heads=2,
            decoder_layers=2, mlp_dim=64, num_mask_tokens=4,
        )
        dparams = dino_lib.init_params(
            jax.random.key(0), dino_tiny, swin_tiny, bert_tiny
        )
        sparams = sam_lib.init_params(jax.random.key(1), sam_tiny)
        vocab = {"[CLS]": 0, "[SEP]": 1, "[UNK]": 2, "boat": 3, ".": 4}
        # disable thresholds so seeded logits keep every query/token
        monkeypatch.setattr(dino_sam, "BOX_THRESHOLD", -1.0)
        monkeypatch.setattr(dino_sam, "TEXT_THRESHOLD", -1.0)

        rng = np.random.default_rng(7)
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        kw = dict(
            cfg=dino_tiny, swin_cfg=swin_tiny, bert_cfg=bert_tiny,
            det_hw=(64, 64),
        )
        mask = dino_sam.extract_mask(
            dparams, sparams, img, "boat", sam_cfg=sam_tiny, vocab=vocab, **kw
        )
        assert mask.shape == (64, 64) and mask.dtype == bool

        boxes, phrases = dino_sam.detect(dparams, img, "boat", vocab=vocab, **kw)
        assert boxes.shape[0] > 0 and len(phrases) == boxes.shape[0]
        xyxy = dino_sam._boxes_to_xyxy(boxes, 64, 64)
        masks = sam_lib.predict_boxes(sparams, sam_tiny, img, xyxy)
        np.testing.assert_array_equal(np.asarray(mask), masks.sum(0) > 0)


class TestTextFeatureCacheKeying:
    def test_vocab_change_is_a_cache_miss(self, monkeypatch):
        """Same params + prompt with a DIFFERENT vocab must retokenize and
        re-encode (regression: vocab was absent from the cache key, so a
        second vocab silently reused the first's token ids/features)."""
        import numpy as np

        from tbist_tpu.models import dino_sam

        calls = []

        def fake_encode(params, cfg, ids, mask, bert_cfg=None):
            calls.append(np.asarray(ids).tolist())
            return np.asarray(ids, np.float32)

        monkeypatch.setattr(dino_sam, "_dino_text_jit", fake_encode)
        dino_sam._TEXT_FEAT_CACHE.clear()
        params = {"w": 1}
        v1 = {"[CLS]": 0, "[SEP]": 1, "boat": 2, "[UNK]": 3}
        v2 = {"[CLS]": 10, "[SEP]": 11, "boat": 12, "[UNK]": 13}

        ids1 = dino_sam._text_features(params, "boat", v1)[0]
        ids2 = dino_sam._text_features(params, "boat", v2)[0]
        assert ids1 != ids2 and len(calls) == 2

        assert dino_sam._text_features(params, "boat", v1)[0] == ids1
        assert len(calls) == 2  # hit: no new encode

        # entries pin strong refs to params AND vocab so the id()-based
        # key cannot alias a recycled object
        assert any(
            p is params and v is v1
            for (_, p, v) in dino_sam._TEXT_FEAT_CACHE.values()
        )
        dino_sam._TEXT_FEAT_CACHE.clear()


class TestBatchedMaskChainTiny:
    """extract_masks_batch (ONE DINO + ONE SAM program per chunk — the
    masked-text video lane) must match per-frame extract_mask."""

    def _tiny(self):
        import jax

        from tbist_tpu.models import bert as bert_lib
        from tbist_tpu.models import dino as dino_lib
        from tbist_tpu.models import sam as sam_lib
        from tbist_tpu.models import swin as swin_lib

        swin_tiny = swin_lib.SwinConfig(
            embed_dim=8, depths=(1, 1, 1, 1), heads=(1, 2, 4, 8), window=4,
            mlp_ratio=2, out_indices=(1, 2, 3),
        )
        bert_tiny = bert_lib.BertConfig(
            vocab=128, hidden=32, layers=2, heads=2, ffn=64, max_pos=64,
            type_vocab=2,
        )
        dino_tiny = dino_lib.DinoConfig(
            d_model=16, heads=2, levels=4, points=2, enc_layers=2,
            dec_layers=2, ffn=32, num_queries=20, fusion_heads=2,
            fusion_dim=32,
        )
        sam_tiny = sam_lib.SamConfig(
            img_size=64, patch=16, width=32, layers=2, heads=2, window=2,
            global_layers=(1,), embed_dim=32, decoder_heads=2,
            decoder_layers=2, mlp_dim=64, num_mask_tokens=4,
        )
        dparams = dino_lib.init_params(
            jax.random.key(0), dino_tiny, swin_tiny, bert_tiny
        )
        sparams = sam_lib.init_params(jax.random.key(1), sam_tiny)
        vocab = {"[CLS]": 0, "[SEP]": 1, "[UNK]": 2, "boat": 3, ".": 4}
        kw = dict(
            cfg=dino_tiny, swin_cfg=swin_tiny, bert_cfg=bert_tiny,
            det_hw=(64, 64),
        )
        return dparams, sparams, sam_tiny, vocab, kw

    def test_batch_matches_per_frame(self, monkeypatch):
        dparams, sparams, sam_tiny, vocab, kw = self._tiny()
        # disable thresholds: seeded logits keep every query, so every
        # frame exercises the padded-box decode with real boxes
        monkeypatch.setattr(dino_sam, "BOX_THRESHOLD", -1.0)
        monkeypatch.setattr(dino_sam, "TEXT_THRESHOLD", -1.0)
        rng = np.random.default_rng(11)
        frames = (rng.random((3, 64, 64, 3)) * 255).astype(np.uint8)
        batch = dino_sam.extract_masks_batch(
            dparams, sparams, frames, "boat", sam_cfg=sam_tiny, vocab=vocab,
            **kw,
        )
        assert batch.shape == (3, 64, 64) and batch.dtype == bool
        for i in range(3):
            single = dino_sam.extract_mask(
                dparams, sparams, frames[i], "boat", sam_cfg=sam_tiny,
                vocab=vocab, **kw,
            )
            # same models, different program shapes (batched + vmapped
            # decode); the >0 threshold may flip a rare borderline pixel
            mismatch = np.mean(np.asarray(batch[i]) != np.asarray(single))
            assert mismatch < 0.001, f"frame {i}: {mismatch:.4f} mismatch"

    def test_zero_detections_all_false(self, monkeypatch):
        dparams, sparams, sam_tiny, vocab, kw = self._tiny()
        monkeypatch.setattr(dino_sam, "BOX_THRESHOLD", 2.0)  # impossible
        rng = np.random.default_rng(12)
        frames = (rng.random((2, 64, 64, 3)) * 255).astype(np.uint8)
        batch = dino_sam.extract_masks_batch(
            dparams, sparams, frames, "boat", sam_cfg=sam_tiny, vocab=vocab,
            **kw,
        )
        assert batch.shape == (2, 64, 64)
        assert not bool(batch.any())

    def test_mixed_box_counts_pad_and_mask(self, monkeypatch):
        """Frames with different detection counts share one padded decode:
        force frame 0 to zero boxes via a per-frame threshold trick is not
        possible (one threshold), so instead check K-padding with all
        frames detected and B=1 vs B=3 consistency of a single frame."""
        dparams, sparams, sam_tiny, vocab, kw = self._tiny()
        monkeypatch.setattr(dino_sam, "BOX_THRESHOLD", -1.0)
        monkeypatch.setattr(dino_sam, "TEXT_THRESHOLD", -1.0)
        rng = np.random.default_rng(13)
        frames = (rng.random((3, 64, 64, 3)) * 255).astype(np.uint8)
        b3 = dino_sam.extract_masks_batch(
            dparams, sparams, frames, "boat", sam_cfg=sam_tiny, vocab=vocab,
            **kw,
        )
        b1 = dino_sam.extract_masks_batch(
            dparams, sparams, frames[:1], "boat", sam_cfg=sam_tiny,
            vocab=vocab, **kw,
        )
        mismatch = np.mean(np.asarray(b3[0]) != np.asarray(b1[0]))
        assert mismatch < 0.001


class TestDetectionSizeKnob:
    """TextEffectConfig.detection_size plumbs through to the DINO input
    resolution (TPU-native extension; reference hardcodes
    RandomResize([800], max 1333) at
    groundingdino_text_object_detector.py:43-49)."""

    def test_extract_mask_honors_det_size(self, monkeypatch):
        tiny = TestBatchedMaskChainTiny()
        dparams, sparams, sam_tiny, vocab, kw = tiny._tiny()
        kw.pop("det_hw")  # let the knob drive the resolution
        monkeypatch.setattr(dino_sam, "BOX_THRESHOLD", -1.0)
        monkeypatch.setattr(dino_sam, "TEXT_THRESHOLD", -1.0)
        seen = []
        real = dino_sam._dino_jit

        def spy(params, cfg, image, *a, **k):
            seen.append(tuple(image.shape))
            return real(params, cfg, image, *a, **k)

        monkeypatch.setattr(dino_sam, "_dino_jit", spy)
        rng = np.random.default_rng(21)
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        mask = dino_sam.extract_mask(
            dparams, sparams, img, "boat", sam_cfg=sam_tiny, vocab=vocab,
            det_size=32, det_max=1333, **kw,
        )
        assert mask.shape == (64, 64)  # mask stays in content coordinates
        assert seen[-1][1:3] == (32, 32)  # detector ran at the low res

        frames = (rng.random((2, 64, 64, 3)) * 255).astype(np.uint8)
        batch = dino_sam.extract_masks_batch(
            dparams, sparams, frames, "boat", sam_cfg=sam_tiny, vocab=vocab,
            det_size=32, det_max=1333, **kw,
        )
        assert batch.shape == (2, 64, 64)
        assert seen[-1][1:3] == (32, 32)

    def test_detection_kwargs_gate(self):
        from tbist_tpu.effects import masking
        from tbist_tpu.utils.config import TextEffectConfig

        # defaults -> empty kwargs, so (image, prompt) extractors still work
        assert masking._detection_kwargs(TextEffectConfig()) == {}
        kw = masking._detection_kwargs(TextEffectConfig(detection_size=400))
        assert kw == {"det_size": 400, "det_max": 1333}
        kw = masking._detection_kwargs(
            TextEffectConfig(detection_size=400, segmentation_size=512)
        )
        assert kw == {"det_size": 400, "det_max": 1333, "seg_size": 512}
        # seg-only request still routes through (detection at defaults)
        kw = masking._detection_kwargs(TextEffectConfig(segmentation_size=512))
        assert kw == {"det_size": 800, "det_max": 1333, "seg_size": 512}

    def test_cli_flag_plumbs(self):
        from tbist_tpu import cli

        args = cli.build_parser().parse_args(
            ["--image", "x.png", "--out", "y.png", "--text-style", "fire",
             "--text-location", "boat", "--detection-size", "400"]
        )
        req = cli.request_from_args(args)
        assert req.text.detection_size == 400
        assert req.text.detection_max_size == 1333

    def test_sam_params_for_size(self):
        import jax

        from tbist_tpu.models import sam as sam_lib

        cfg = sam_lib.SamConfig(
            img_size=64, patch=16, width=32, layers=2, heads=2, window=2,
            global_layers=(1,), embed_dim=32, decoder_heads=2,
            decoder_layers=2, mlp_dim=64, num_mask_tokens=4,
        )
        params = sam_lib.init_params(jax.random.key(3), cfg)
        # native size: identity, no copy
        p_same, c_same = sam_lib.params_for_size(params, cfg, 64)
        assert p_same is params and c_same is cfg
        # adapted: pos grid and GLOBAL rel-pos rows track the new grid
        p2, c2 = sam_lib.params_for_size(params, cfg, 32)
        assert c2.img_size == 32
        g2 = 32 // cfg.patch
        assert p2["pos_embed"].shape == (1, g2, g2, cfg.width)
        head_dim = cfg.width // cfg.heads
        assert p2["blocks"][1]["attn"]["rel_pos_h"].shape == (2 * g2 - 1, head_dim)
        # window layer untouched (same object)
        assert p2["blocks"][0] is params["blocks"][0]
        # cached
        p3, _ = sam_lib.params_for_size(params, cfg, 32)
        assert p3 is p2
        # non-multiple-of-patch rejected
        import pytest as _pytest

        with _pytest.raises(ValueError):
            sam_lib.params_for_size(params, cfg, 40)
        sam_lib._SIZE_ADAPTED_CACHE.clear()

    def test_extract_mask_honors_seg_size(self, monkeypatch):
        tiny = TestBatchedMaskChainTiny()
        dparams, sparams, sam_tiny, vocab, kw = tiny._tiny()
        monkeypatch.setattr(dino_sam, "BOX_THRESHOLD", -1.0)
        monkeypatch.setattr(dino_sam, "TEXT_THRESHOLD", -1.0)
        from tbist_tpu.models import sam as sam_lib

        seen = []
        real = sam_lib.encode_uint8

        def spy(params, cfg, image):
            seen.append(cfg.img_size)
            return real(params, cfg, image)

        monkeypatch.setattr(sam_lib, "encode_uint8", spy)
        rng = np.random.default_rng(23)
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        mask = dino_sam.extract_mask(
            dparams, sparams, img, "boat", sam_cfg=sam_tiny, vocab=vocab,
            seg_size=32, **kw,
        )
        assert mask.shape == (64, 64)
        assert seen[-1] == 32  # encoder ran at the adapted size
        sam_lib._SIZE_ADAPTED_CACHE.clear()
