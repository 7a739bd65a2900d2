"""CLIP text tower structural tests + BPE tokenizer over a synthetic vocab."""

import gzip
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from tbist_tpu.models import clip_text


def _tiny_params():
    """Shrink the tower for tests by truncating blocks of a seeded init."""
    params = clip_text.init_params(jax.random.key(0))
    params["blocks"] = params["blocks"][:2]
    return params


class TestEncoder:
    def test_encode_shape_and_eot_selection(self):
        params = _tiny_params()
        toks = np.zeros((1, clip_text.CONTEXT), np.int32)
        toks[0, :5] = [49406, 320, 1125, 539, 49407]  # sot ... eot
        out = clip_text.encode_tokens(params, jnp.asarray(toks))
        assert out.shape == (1, clip_text.WIDTH)
        assert np.isfinite(np.asarray(out)).all()

    def test_causality(self):
        """Changing a token after EOT must not affect the embedding."""
        params = _tiny_params()
        toks = np.zeros((1, clip_text.CONTEXT), np.int32)
        toks[0, :4] = [49406, 320, 1125, 49407]
        a = np.asarray(clip_text.encode_tokens(params, jnp.asarray(toks)))
        toks2 = toks.copy()
        toks2[0, 10] = 777  # after EOT (padding region)
        b = np.asarray(clip_text.encode_tokens(params, jnp.asarray(toks2)))
        # padding tokens DO attend (CLIP uses causal mask only), but the
        # EOT position at index 3 only sees positions <= 3
        np.testing.assert_allclose(a, b, atol=1e-5)


class TestTokenizer:
    def _make_bpe(self, path):
        """Minimal merges file in the CLIP format."""
        lines = ["#version: 0.2"]
        lines += ["h e", "he l", "hel l", "hell o</w>", "b o", "bo a", "boa t</w>"]
        # pad to the expected merge count window (the loader slices)
        with gzip.open(path, "wt") as f:
            f.write("\n".join(lines) + "\n")

    def test_tokenize_roundtrip(self):
        with tempfile.TemporaryDirectory() as d:
            bpe = os.path.join(d, "bpe.txt.gz")
            self._make_bpe(bpe)
            tok = clip_text.ClipTokenizer(bpe)
            out = tok.tokenize("hello boat")
            assert out.shape == (1, clip_text.CONTEXT)
            sot = tok.encoder["<|startoftext|>"]
            eot = tok.encoder["<|endoftext|>"]
            ids = out[0]
            assert ids[0] == sot
            assert eot in ids
            # merged tokens present: "hello</w>" and "boat</w>" exist in vocab
            assert tok.encoder["hello</w>"] in ids
            assert tok.encoder["boat</w>"] in ids

    def test_unknown_chars_fall_back_to_bytes(self):
        with tempfile.TemporaryDirectory() as d:
            bpe = os.path.join(d, "bpe.txt.gz")
            self._make_bpe(bpe)
            tok = clip_text.ClipTokenizer(bpe)
            out = tok.tokenize("xyz")
            assert out.shape == (1, clip_text.CONTEXT)
