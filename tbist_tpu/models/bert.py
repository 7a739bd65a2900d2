"""BERT-base text encoder in pure JAX (GroundingDINO's language tower).

Reference: the SwinT-OGC config selects ``text_encoder_type =
"bert-base-uncased"`` (GroundingDINO_SwinT_OGC.py:34). Standard BERT:
word/position/type embeddings + LayerNorm, 12 post-LN transformer layers
(GELU, 3072 FFN), hidden 768. GroundingDINO consumes the sequence output
(projected to 256 by ``feat_map``); the pooler is unused.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class BertConfig(NamedTuple):
    vocab: int = 30522
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    ffn: int = 3072
    max_pos: int = 512
    type_vocab: int = 2


BASE = BertConfig()


def _layer_norm(x, p, eps=1e-12):
    mean = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def forward(
    params,
    cfg: BertConfig,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    position_ids: jnp.ndarray | None = None,
    token_type_ids: jnp.ndarray | None = None,
    attention_bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(B, T) ids -> (B, T, hidden) sequence output.

    ``attention_bias`` optionally replaces the standard padding mask with a
    full (B, 1, T, T) additive bias (GroundingDINO builds a block-diagonal
    text self-attention mask across sub-sentences)."""
    b, t = input_ids.shape
    if position_ids is None:
        position_ids = jnp.broadcast_to(jnp.arange(t), (b, t))
    if token_type_ids is None:
        token_type_ids = jnp.zeros((b, t), jnp.int32)

    x = (
        params["word_emb"][input_ids]
        + params["pos_emb"][position_ids]
        + params["type_emb"][token_type_ids]
    )
    x = _layer_norm(x, params["emb_ln"])

    if attention_bias is None:
        attention_bias = (1.0 - attention_mask[:, None, None, :]) * -1e9

    h = cfg.heads
    d = cfg.hidden // h
    for blk in params["blocks"]:
        q = (x @ blk["q_w"] + blk["q_b"]).reshape(b, t, h, d).transpose(0, 2, 1, 3)
        k = (x @ blk["k_w"] + blk["k_b"]).reshape(b, t, h, d).transpose(0, 2, 1, 3)
        v = (x @ blk["v_w"] + blk["v_b"]).reshape(b, t, h, d).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d) + attention_bias
        attn = jax.nn.softmax(logits, -1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, cfg.hidden)
        x = _layer_norm(x + (ctx @ blk["o_w"] + blk["o_b"]), blk["attn_ln"])
        ffn = jax.nn.gelu(x @ blk["fc1_w"] + blk["fc1_b"], approximate=False)
        x = _layer_norm(x + (ffn @ blk["fc2_w"] + blk["fc2_b"]), blk["ffn_ln"])
    return x


def convert_hf_state_dict(sd, prefix: str = "bert.", cfg: BertConfig = BASE) -> Dict:
    def arr(k):
        return jnp.asarray(np.asarray(sd[prefix + k], dtype=np.float32))

    def lin_w(k):
        return arr(k).T

    blocks = []
    for i in range(cfg.layers):
        p = f"encoder.layer.{i}"
        blocks.append(
            {
                "q_w": lin_w(f"{p}.attention.self.query.weight"),
                "q_b": arr(f"{p}.attention.self.query.bias"),
                "k_w": lin_w(f"{p}.attention.self.key.weight"),
                "k_b": arr(f"{p}.attention.self.key.bias"),
                "v_w": lin_w(f"{p}.attention.self.value.weight"),
                "v_b": arr(f"{p}.attention.self.value.bias"),
                "o_w": lin_w(f"{p}.attention.output.dense.weight"),
                "o_b": arr(f"{p}.attention.output.dense.bias"),
                "attn_ln": {
                    "scale": arr(f"{p}.attention.output.LayerNorm.weight"),
                    "bias": arr(f"{p}.attention.output.LayerNorm.bias"),
                },
                "fc1_w": lin_w(f"{p}.intermediate.dense.weight"),
                "fc1_b": arr(f"{p}.intermediate.dense.bias"),
                "fc2_w": lin_w(f"{p}.output.dense.weight"),
                "fc2_b": arr(f"{p}.output.dense.bias"),
                "ffn_ln": {
                    "scale": arr(f"{p}.output.LayerNorm.weight"),
                    "bias": arr(f"{p}.output.LayerNorm.bias"),
                },
            }
        )
    return {
        "word_emb": arr("embeddings.word_embeddings.weight"),
        "pos_emb": arr("embeddings.position_embeddings.weight"),
        "type_emb": arr("embeddings.token_type_embeddings.weight"),
        "emb_ln": {
            "scale": arr("embeddings.LayerNorm.weight"),
            "bias": arr("embeddings.LayerNorm.bias"),
        },
        "blocks": blocks,
    }


def init_params(key: jax.Array, cfg: BertConfig = BASE) -> Dict:
    keys = iter(jax.random.split(key, 8 + cfg.layers * 8))

    def nrm(shape, scale=0.02):
        return jax.random.normal(next(keys), shape, jnp.float32) * scale

    def ln(dim):
        return {"scale": jnp.ones(dim, jnp.float32), "bias": jnp.zeros(dim, jnp.float32)}

    h = cfg.hidden
    blocks = []
    for _ in range(cfg.layers):
        blocks.append(
            {
                "q_w": nrm((h, h)), "q_b": jnp.zeros(h, jnp.float32),
                "k_w": nrm((h, h)), "k_b": jnp.zeros(h, jnp.float32),
                "v_w": nrm((h, h)), "v_b": jnp.zeros(h, jnp.float32),
                "o_w": nrm((h, h)), "o_b": jnp.zeros(h, jnp.float32),
                "attn_ln": ln(h),
                "fc1_w": nrm((h, cfg.ffn)), "fc1_b": jnp.zeros(cfg.ffn, jnp.float32),
                "fc2_w": nrm((cfg.ffn, h)), "fc2_b": jnp.zeros(h, jnp.float32),
                "ffn_ln": ln(h),
            }
        )
    return {
        "word_emb": nrm((cfg.vocab, h)),
        "pos_emb": nrm((cfg.max_pos, h)),
        "type_emb": nrm((cfg.type_vocab, h)),
        "emb_ln": ln(h),
        "blocks": blocks,
    }
