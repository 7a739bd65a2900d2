"""CLIP ViT-B/32 text encoder in pure JAX (NHWC-era rewrite, not a port).

Parity target: the reference encodes prompts with openai-clip's
``encode_text`` (text/FastTextTransfer.py:32,52-56). Architecture
(ViT-B/32 text tower): vocab 49408, context 77, width 512, 12 layers,
8 heads, QuickGELU MLPs, causal attention, final LayerNorm, features taken
at the EOT token position and projected by ``text_projection``.

Weights/vocab resolution (zero-egress environment):
* ``TBIST_CLIP_PTH`` or ``weights_cache/clip_vitb32.pth`` — an openai CLIP
  state dict, converted on first use.
* ``TBIST_CLIP_BPE`` or ``weights_cache/bpe_simple_vocab_16e6.txt.gz`` —
  the CLIP BPE merges file for the real tokenizer.
* Fallback: a deterministic prompt-seeded embedding
  (effects.text_transfer.fallback_text_embedding) so the pipeline remains
  runnable; a warning is logged.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
import re
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tbist_tpu.utils.logging import logger

CONTEXT = 77
WIDTH = 512
LAYERS = 12
HEADS = 8
VOCAB = 49408

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "weights_cache"
)


# ---------------------------------------------------------------------------
# BPE tokenizer (loads the standard CLIP merges file when present)
# ---------------------------------------------------------------------------


def _bytes_to_unicode() -> Dict[int, str]:
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


class ClipTokenizer:
    """CLIP's byte-level BPE (requires the merges file)."""

    def __init__(self, bpe_path: str):
        self.byte_encoder = _bytes_to_unicode()
        merges = gzip.open(bpe_path).read().decode("utf-8").split("\n")
        merges = merges[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {v: i for i, v in enumerate(vocab)}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }
        try:  # exact CLIP pattern (unicode classes need the regex module)
            import regex

            self.pat = regex.compile(
                r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
                regex.IGNORECASE,
            )
        except ImportError:  # ASCII approximation (fine for English prompts)
            self.pat = re.compile(
                r"'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+",
                re.IGNORECASE,
            )

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = set(zip(word[:-1], word[1:]))
            bigram = min(
                pairs, key=lambda p: self.bpe_ranks.get(p, float("inf"))
            )
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                    new_word.extend(word[i:j])
                    i = j
                except ValueError:
                    new_word.extend(word[i:])
                    break
                if i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        text = html.unescape(html.unescape(text))
        text = re.sub(r"\s+", " ", text).strip().lower()
        ids: List[int] = []
        for token in self.pat.findall(text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(token).split(" "))
        return ids

    def tokenize(self, text: str) -> np.ndarray:
        sot, eot = self.encoder["<|startoftext|>"], self.encoder["<|endoftext|>"]
        ids = [sot] + self.encode(text)[: CONTEXT - 2] + [eot]
        out = np.zeros((1, CONTEXT), np.int32)
        out[0, : len(ids)] = ids
        return out


# ---------------------------------------------------------------------------
# Transformer
# ---------------------------------------------------------------------------


def _layer_norm(x, p, eps=1e-5):
    mean = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _attention(x, p, mask):
    b, t, d = x.shape
    qkv = x @ p["in_proj_w"].T + p["in_proj_b"]  # (B, T, 3D)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(z):
        return z.reshape(b, t, HEADS, d // HEADS).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    scale = 1.0 / jnp.sqrt(d / HEADS)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale + mask
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
    return out @ p["out_proj_w"].T + p["out_proj_b"]


def encode_tokens(params, tokens: jnp.ndarray) -> jnp.ndarray:
    """tokens: (B, 77) int32 -> (B, 512) text embeddings (un-normalized)."""
    x = params["token_embedding"][tokens] + params["positional_embedding"]
    mask = jnp.triu(jnp.full((CONTEXT, CONTEXT), -jnp.inf), k=1)
    for blk in params["blocks"]:
        x = x + _attention(_layer_norm(x, blk["ln_1"]), blk["attn"], mask)
        h = _layer_norm(x, blk["ln_2"])
        h = _quick_gelu(h @ blk["mlp"]["fc_w"].T + blk["mlp"]["fc_b"])
        h = h @ blk["mlp"]["proj_w"].T + blk["mlp"]["proj_b"]
        x = x + h
    x = _layer_norm(x, params["ln_final"])
    eot = jnp.argmax(tokens, axis=-1)
    feats = x[jnp.arange(x.shape[0]), eot]
    return feats @ params["text_projection"]


def convert_openai_state_dict(sd) -> Dict:
    """openai CLIP state dict -> JAX pytree (text tower only)."""

    def arr(k):
        return jnp.asarray(np.asarray(sd[k], dtype=np.float32))

    blocks = []
    for i in range(LAYERS):
        pre = f"transformer.resblocks.{i}"
        blocks.append(
            {
                "ln_1": {"scale": arr(f"{pre}.ln_1.weight"), "bias": arr(f"{pre}.ln_1.bias")},
                "ln_2": {"scale": arr(f"{pre}.ln_2.weight"), "bias": arr(f"{pre}.ln_2.bias")},
                "attn": {
                    "in_proj_w": arr(f"{pre}.attn.in_proj_weight"),
                    "in_proj_b": arr(f"{pre}.attn.in_proj_bias"),
                    "out_proj_w": arr(f"{pre}.attn.out_proj.weight"),
                    "out_proj_b": arr(f"{pre}.attn.out_proj.bias"),
                },
                "mlp": {
                    "fc_w": arr(f"{pre}.mlp.c_fc.weight"),
                    "fc_b": arr(f"{pre}.mlp.c_fc.bias"),
                    "proj_w": arr(f"{pre}.mlp.c_proj.weight"),
                    "proj_b": arr(f"{pre}.mlp.c_proj.bias"),
                },
            }
        )
    return {
        "token_embedding": arr("token_embedding.weight"),
        "positional_embedding": arr("positional_embedding"),
        "blocks": blocks,
        "ln_final": {"scale": arr("ln_final.weight"), "bias": arr("ln_final.bias")},
        "text_projection": arr("text_projection"),
    }


def _init_params_impl(key: jax.Array) -> Dict:
    """Seeded random text tower (fallback when no checkpoint exists)."""
    def norm(k, shape, scale):
        return jax.random.normal(k, shape, jnp.float32) * scale

    keys = iter(jax.random.split(key, 8 + LAYERS * 8))
    blocks = []
    for _ in range(LAYERS):
        blocks.append(
            {
                "ln_1": {"scale": jnp.ones(WIDTH), "bias": jnp.zeros(WIDTH)},
                "ln_2": {"scale": jnp.ones(WIDTH), "bias": jnp.zeros(WIDTH)},
                "attn": {
                    "in_proj_w": norm(next(keys), (3 * WIDTH, WIDTH), WIDTH**-0.5),
                    "in_proj_b": jnp.zeros(3 * WIDTH),
                    "out_proj_w": norm(next(keys), (WIDTH, WIDTH), WIDTH**-0.5),
                    "out_proj_b": jnp.zeros(WIDTH),
                },
                "mlp": {
                    "fc_w": norm(next(keys), (4 * WIDTH, WIDTH), WIDTH**-0.5),
                    "fc_b": jnp.zeros(4 * WIDTH),
                    "proj_w": norm(next(keys), (WIDTH, 4 * WIDTH), (4 * WIDTH) ** -0.5),
                    "proj_b": jnp.zeros(WIDTH),
                },
            }
        )
    return {
        "token_embedding": norm(next(keys), (VOCAB, WIDTH), 0.02),
        "positional_embedding": norm(next(keys), (CONTEXT, WIDTH), 0.01),
        "blocks": blocks,
        "ln_final": {"scale": jnp.ones(WIDTH), "bias": jnp.zeros(WIDTH)},
        "text_projection": norm(next(keys), (WIDTH, WIDTH), WIDTH**-0.5),
    }


def _find(paths: List[str]) -> Optional[str]:
    for p in paths:
        if p and os.path.exists(p):
            return p
    return None


@functools.lru_cache(maxsize=1)
def get_default_encoder():
    """Resolve a prompt->embedding callable (real CLIP or fallback)."""
    pth = _find(
        [
            os.environ.get("TBIST_CLIP_PTH", ""),
            os.path.join(_CACHE_DIR, "clip_vitb32.pth"),
        ]
    )
    bpe = _find(
        [
            os.environ.get("TBIST_CLIP_BPE", ""),
            os.path.join(_CACHE_DIR, "bpe_simple_vocab_16e6.txt.gz"),
        ]
    )
    if pth and bpe:
        import torch

        sd = torch.load(pth, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        params = convert_openai_state_dict(
            {k: v.float().numpy() for k, v in sd.items() if isinstance(v, torch.Tensor)}
        )
        tokenizer = ClipTokenizer(bpe)
        encode = jax.jit(lambda toks: encode_tokens(params, toks))

        def encoder(text: str) -> jnp.ndarray:
            return encode(jnp.asarray(tokenizer.tokenize(text)))

        logger.info("CLIP text encoder: loaded converted ViT-B/32 weights")
        return encoder

    from tbist_tpu.utils import degraded

    degraded.mark("text_transfer", "clip_text_fallback")
    logger.warning(
        "CLIP text encoder: no checkpoint/vocab found — using deterministic "
        "prompt-seeded fallback embeddings (set TBIST_CLIP_PTH / TBIST_CLIP_BPE)"
    )
    from tbist_tpu.effects.text_transfer import fallback_text_embedding

    return fallback_text_embedding


def init_params(*args, **kwargs):
    """Seeded init; always float32 (x64 test mode would otherwise produce
    float64 from jnp.zeros/jax.random defaults)."""
    import jax

    return jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "dtype") and a.dtype.kind == "f"
        else a,
        _init_params_impl(*args, **kwargs),
    )
