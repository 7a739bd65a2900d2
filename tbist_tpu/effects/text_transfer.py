"""Feed-forward text-based stylization (FastTextStyleTransfer parity).

Reference: text/FastTextTransfer.py:36-66 — prompt → CLIP ViT-B/32 text
embedding (mean over batch, fp32, L2-normalized) → 5-layer MLP → 100-d
style embedding → Ghiasi transformer → sigmoid image.

The text encoder is pluggable: the full CLIP text tower lives in
``tbist_tpu.models.clip_text`` (with a weight converter); when no CLIP
checkpoint/vocab exists in the environment a deterministic fallback
embedding keeps the pipeline runnable end-to-end (documented, seeded).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tbist_tpu.models import clip_mlp, ghiasi


@functools.lru_cache(maxsize=1)
def default_params(seed: int = 0):
    from tbist_tpu.weights import ghiasi_convert

    return ghiasi_convert.get_params()


def fallback_text_embedding(text: str) -> jnp.ndarray:
    """Deterministic 512-d unit embedding from a prompt (no CLIP weights).

    Used only when the real CLIP text encoder has no checkpoint: a seeded
    Gaussian keyed on the prompt bytes. Distinct prompts map to distinct
    directions, so the full pipeline stays exercised and reproducible.
    """
    import zlib

    seed = zlib.crc32(text.encode("utf-8"))
    vec = np.asarray(
        jax.random.normal(jax.random.key(seed), (1, 512), jnp.float32)
    )
    return jnp.asarray(vec / np.linalg.norm(vec, axis=-1, keepdims=True))


@functools.partial(jax.jit, static_argnames=())
def _transfer_jit(g_params, m_params, image, text_embedding):
    style = clip_mlp.apply(m_params, text_embedding)
    return ghiasi.apply(g_params, image, style)


def perform_transfer(
    image: jnp.ndarray,
    text: str,
    g_params=None,
    m_params=None,
    text_encoder: Optional[Callable[[str], jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Apply the text style to an NHWC [0,1] image. Returns same shape.

    Matches the reference flow: embedding is mean-pooled, cast to fp32 and
    L2-normalized before the MLP (FastTextTransfer.py:52-56).
    """
    if g_params is None or m_params is None:
        g_params, m_params = default_params()
    if text_encoder is None:
        from tbist_tpu.models import clip_text

        text_encoder = clip_text.get_default_encoder()
    emb = text_encoder(text)
    emb = jnp.mean(emb.astype(jnp.float32), axis=0, keepdims=True)
    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return _transfer_jit(g_params, m_params, image, emb)
