"""T5 encoder-decoder in pure JAX (for the emoji-LM texture-mask path).

Reference usage: text/EmojiMaskExtractor.py loads HF
``KomeijiForce/t5-base-emojilm`` (a T5-base fine-tune) and calls
``generate`` with sampling. Here the model is functional JAX: RMSNorm,
relative-position-bias attention, ReLU MLPs (T5 v1.0), tied embeddings
with the 1/sqrt(d) logit scale, and a ``lax.while_loop`` greedy/sampled
decoder with a static-shape KV cache — the autoregressive loop compiles
once and runs entirely on device.

Config: T5-base (d_model 768, 12+12 layers, 12 heads, d_ff 3072,
vocab 32128, rel-pos 32 buckets / distance 128).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class T5Config(NamedTuple):
    vocab: int = 32128
    d_model: int = 768
    d_ff: int = 3072
    heads: int = 12
    d_kv: int = 64
    layers: int = 12
    rel_buckets: int = 32
    rel_distance: int = 128
    pad_id: int = 0
    eos_id: int = 1
    decoder_start_id: int = 0


BASE = T5Config()


def _rms_norm(x, scale, eps=1e-6):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)) * scale


def _rel_bucket(rel_pos, bidirectional: bool, num_buckets: int, max_dist: int):
    """T5 relative position bucketing (HF modeling_t5 semantics)."""
    ret = 0
    n = -rel_pos
    if bidirectional:
        num_buckets //= 2
        ret += (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_dist / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


def _rel_bias(emb, q_len, k_len, bidirectional, cfg: T5Config, q_offset=0):
    """(heads, q_len, k_len) relative position bias from embedding (buckets, heads)."""
    ctx = jnp.arange(q_len)[:, None] + q_offset
    mem = jnp.arange(k_len)[None, :]
    buckets = _rel_bucket(mem - ctx, bidirectional, cfg.rel_buckets, cfg.rel_distance)
    return emb[buckets].transpose(2, 0, 1)


def _attn(q, k, v, bias):
    """q: (B,H,Tq,D) k,v: (B,H,Tk,D) bias: broadcastable (1,H,Tq,Tk).
    T5 does NOT scale by sqrt(d) (folded into init)."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) + bias
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _heads(x, cfg: T5Config):
    b, t, _ = x.shape
    return x.reshape(b, t, cfg.heads, cfg.d_kv).transpose(0, 2, 1, 3)


def _merge(x):
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


def _self_attention(x, p, bias, cfg):
    h = _rms_norm(x, p["ln"])
    q, k, v = (_heads(h @ p[w], cfg) for w in ("q", "k", "v"))
    return x + _merge(_attn(q, k, v, bias)) @ p["o"]


def _mlp(x, p):
    h = _rms_norm(x, p["ln"])
    return x + jax.nn.relu(h @ p["wi"]) @ p["wo"]


def encode(params, cfg: T5Config, input_ids: jnp.ndarray, attn_mask: jnp.ndarray):
    """input_ids/attn_mask: (B, T). Returns encoder hidden states (B, T, D)."""
    x = params["shared"][input_ids]
    t = input_ids.shape[1]
    bias = _rel_bias(params["enc_rel"], t, t, True, cfg)[None]
    bias = bias + (1.0 - attn_mask[:, None, None, :]) * -1e9
    for layer in params["encoder"]:
        x = _self_attention(x, layer["self"], bias, cfg)
        x = _mlp(x, layer["mlp"])
    return _rms_norm(x, params["enc_ln"])


class DecodeCache(NamedTuple):
    k: jnp.ndarray  # (layers, B, H, T_max, D)
    v: jnp.ndarray


def _decoder_step(params, cfg, tok, pos, cache: DecodeCache, enc_out, enc_mask):
    """One decode step with KV cache. tok: (B,) int32; pos: scalar int32."""
    x = params["shared"][tok][:, None, :]  # (B, 1, D)
    t_max = cache.k.shape[3]
    new_k, new_v = [], []
    # causal mask over cache positions
    pos_mask = (jnp.arange(t_max)[None, :] <= pos).astype(jnp.float32)
    cross_bias = (1.0 - enc_mask[:, None, None, :]) * -1e9
    for li, layer in enumerate(params["decoder"]):
        # self attention (cached)
        h = _rms_norm(x, layer["self"]["ln"])
        q = _heads(h @ layer["self"]["q"], cfg)
        k_new = _heads(h @ layer["self"]["k"], cfg)
        v_new = _heads(h @ layer["self"]["v"], cfg)
        z = jnp.zeros((), jnp.int32)
        k_cache = jax.lax.dynamic_update_slice(cache.k[li], k_new, (z, z, pos, z))
        v_cache = jax.lax.dynamic_update_slice(cache.v[li], v_new, (z, z, pos, z))
        new_k.append(k_cache)
        new_v.append(v_cache)
        bias = _rel_bias(params["dec_rel"], 1, t_max, False, cfg, q_offset=pos)[None]
        bias = bias + (1.0 - pos_mask)[:, None, None, :] * -1e9
        x = x + _merge(_attn(q, k_cache, v_cache, bias)) @ layer["self"]["o"]
        # cross attention
        h = _rms_norm(x, layer["cross"]["ln"])
        q = _heads(h @ layer["cross"]["q"], cfg)
        ck = _heads(enc_out @ layer["cross"]["k"], cfg)
        cv = _heads(enc_out @ layer["cross"]["v"], cfg)
        x = x + _merge(_attn(q, ck, cv, cross_bias)) @ layer["cross"]["o"]
        x = _mlp(x, layer["mlp"])
    x = _rms_norm(x, params["dec_ln"])
    logits = (x * (cfg.d_model**-0.5)) @ params["shared"].T  # tied embeddings
    return logits[:, 0], DecodeCache(jnp.stack(new_k), jnp.stack(new_v))


def sample_filter(
    logits: jnp.ndarray, top_k: int, top_p: float
) -> jnp.ndarray:
    """Top-k then top-p logit filtering, HF-warper parity.

    Matches transformers' TopKLogitsWarper followed by TopPLogitsWarper
    (the order ``generate`` chains them in): keep the k largest logits,
    then over the renormalized survivors keep the minimal descending
    prefix whose cumulative probability reaches ``top_p`` (HF removes
    ascending-sorted tokens with cumsum <= 1-top_p, which keeps exactly
    the tokens whose preceding descending cumsum is < top_p — the same
    set). Dropped entries become -inf. (B, V) -> (B, V).
    """
    # top-k filter
    kth = jnp.sort(logits, -1)[:, -top_k][:, None]
    filt = jnp.where(logits < kth, -jnp.inf, logits)
    # top-p filter over the surviving top-k
    sorted_logits = jnp.sort(filt, -1)[:, ::-1]
    probs_sorted = jax.nn.softmax(sorted_logits, -1)
    cum = jnp.cumsum(probs_sorted, -1)
    cutoff_idx = jnp.sum(cum < top_p, -1)  # keep first idx+1
    cutoff_logit = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], -1)
    return jnp.where(filt < cutoff_logit, -jnp.inf, filt)


@functools.partial(
    jax.jit, static_argnames=("cfg", "max_len", "do_sample", "top_k")
)
def generate(
    params,
    cfg: T5Config,
    input_ids: jnp.ndarray,
    attn_mask: jnp.ndarray,
    key: jax.Array,
    max_len: int = 16,
    do_sample: bool = False,
    top_k: int = 10,
    top_p: float = 0.95,
) -> jnp.ndarray:
    """Greedy or top-k/top-p sampled decode. Returns (B, max_len) ids
    (pad-filled after EOS). Sampling matches the reference's generate flags
    (do_sample, top_p=0.95, top_k=10 — EmojiMaskExtractor.py:49) but with
    an explicit PRNG key instead of global torch RNG."""
    b = input_ids.shape[0]
    enc_out = encode(params, cfg, input_ids, attn_mask)
    cache = DecodeCache(
        k=jnp.zeros((cfg.layers, b, cfg.heads, max_len, cfg.d_kv), enc_out.dtype),
        v=jnp.zeros((cfg.layers, b, cfg.heads, max_len, cfg.d_kv), enc_out.dtype),
    )
    tokens = jnp.full((b, max_len), cfg.pad_id, jnp.int32)
    tok = jnp.full((b,), cfg.decoder_start_id, jnp.int32)
    done = jnp.zeros((b,), bool)

    def body(carry):
        tok, tokens, cache, done, pos, key = carry
        logits, cache = _decoder_step(params, cfg, tok, pos, cache, enc_out, attn_mask)
        # min_length=1: forbid EOS at the first generated position
        logits = jnp.where(
            (pos == 0)
            & (jnp.arange(cfg.vocab)[None, :] == cfg.eos_id),
            -jnp.inf,
            logits,
        )
        if do_sample:
            key, sub = jax.random.split(key)
            nxt = jax.random.categorical(sub, sample_filter(logits, top_k, top_p))
        else:
            nxt = jnp.argmax(logits, -1)
        nxt = jnp.where(done, cfg.pad_id, nxt).astype(jnp.int32)
        tokens = tokens.at[:, pos].set(nxt)
        done = done | (nxt == cfg.eos_id)
        return nxt, tokens, cache, done, pos + 1, key

    def cond(carry):
        _, _, _, done, pos, _ = carry
        return (pos < max_len) & ~jnp.all(done)

    _, tokens, _, _, _, _ = jax.lax.while_loop(
        cond, body, (tok, tokens, cache, done, jnp.zeros((), jnp.int32), key)
    )
    return tokens


# ---------------------------------------------------------------------------
# weight conversion (HF torch T5 state dict -> pytree)
# ---------------------------------------------------------------------------


def convert_hf_state_dict(sd, cfg: T5Config = BASE) -> Dict:
    def arr(k):
        return jnp.asarray(np.asarray(sd[k], dtype=np.float32))

    def lin(k):  # HF stores (out, in); we use x @ W -> transpose
        return arr(k).T

    def block(side, i, is_dec):
        pre = f"{side}.block.{i}.layer"
        self_p = {
            "ln": arr(f"{pre}.0.layer_norm.weight"),
            "q": lin(f"{pre}.0.SelfAttention.q.weight"),
            "k": lin(f"{pre}.0.SelfAttention.k.weight"),
            "v": lin(f"{pre}.0.SelfAttention.v.weight"),
            "o": lin(f"{pre}.0.SelfAttention.o.weight"),
        }
        out = {"self": self_p}
        mlp_idx = 2 if is_dec else 1
        if is_dec:
            out["cross"] = {
                "ln": arr(f"{pre}.1.layer_norm.weight"),
                "q": lin(f"{pre}.1.EncDecAttention.q.weight"),
                "k": lin(f"{pre}.1.EncDecAttention.k.weight"),
                "v": lin(f"{pre}.1.EncDecAttention.v.weight"),
                "o": lin(f"{pre}.1.EncDecAttention.o.weight"),
            }
        out["mlp"] = {
            "ln": arr(f"{pre}.{mlp_idx}.layer_norm.weight"),
            "wi": lin(f"{pre}.{mlp_idx}.DenseReluDense.wi.weight"),
            "wo": lin(f"{pre}.{mlp_idx}.DenseReluDense.wo.weight"),
        }
        return out

    return {
        "shared": arr("shared.weight"),
        "enc_rel": arr(
            "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
        ),
        "dec_rel": arr(
            "decoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
        ),
        "encoder": [block("encoder", i, False) for i in range(cfg.layers)],
        "decoder": [block("decoder", i, True) for i in range(cfg.layers)],
        "enc_ln": arr("encoder.final_layer_norm.weight"),
        "dec_ln": arr("decoder.final_layer_norm.weight"),
    }


def _init_params_impl(key: jax.Array, cfg: T5Config = BASE) -> Dict:
    """Seeded random params (testing / no-checkpoint fallback)."""
    keys = iter(jax.random.split(key, 4 + cfg.layers * 16))

    def lin(cin, cout, scale=None):
        s = scale if scale is not None else cin**-0.5
        return jax.random.normal(next(keys), (cin, cout), jnp.float32) * s

    def block(is_dec):
        d = {
            "self": {
                "ln": jnp.ones(cfg.d_model),
                "q": lin(cfg.d_model, cfg.heads * cfg.d_kv, (cfg.d_model * cfg.d_kv) ** -0.5),
                "k": lin(cfg.d_model, cfg.heads * cfg.d_kv),
                "v": lin(cfg.d_model, cfg.heads * cfg.d_kv),
                "o": lin(cfg.heads * cfg.d_kv, cfg.d_model),
            },
            "mlp": {
                "ln": jnp.ones(cfg.d_model),
                "wi": lin(cfg.d_model, cfg.d_ff),
                "wo": lin(cfg.d_ff, cfg.d_model),
            },
        }
        if is_dec:
            d["cross"] = {
                "ln": jnp.ones(cfg.d_model),
                "q": lin(cfg.d_model, cfg.heads * cfg.d_kv, (cfg.d_model * cfg.d_kv) ** -0.5),
                "k": lin(cfg.d_model, cfg.heads * cfg.d_kv),
                "v": lin(cfg.d_model, cfg.heads * cfg.d_kv),
                "o": lin(cfg.heads * cfg.d_kv, cfg.d_model),
            }
        return d

    return {
        "shared": jax.random.normal(next(keys), (cfg.vocab, cfg.d_model)) * 1.0,
        "enc_rel": jax.random.normal(next(keys), (cfg.rel_buckets, cfg.heads)) * 0.1,
        "dec_rel": jax.random.normal(next(keys), (cfg.rel_buckets, cfg.heads)) * 0.1,
        "encoder": [block(False) for _ in range(cfg.layers)],
        "decoder": [block(True) for _ in range(cfg.layers)],
        "enc_ln": jnp.ones(cfg.d_model),
        "dec_ln": jnp.ones(cfg.d_model),
    }


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
