"""CLIP-text-embedding → Ghiasi-style-embedding MLP.

Parity with the reference ClipTextEmbeddingTransformer
(text/subnetworks/clip_text_embedding_transformer.py:15-26):
512→256→256→150→150→100 with LeakyReLU(0.2) ×4 and a final Tanh
(CLIPstyler-style, arXiv 2210.03461).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

SIZES = (512, 256, 256, 150, 150, 100)


def _init_params_impl(key: jax.Array, dtype=jnp.float32) -> List[Dict[str, jnp.ndarray]]:
    params = []
    for cin, cout in zip(SIZES[:-1], SIZES[1:]):
        key, k1, k2 = jax.random.split(key, 3)
        bound = 1.0 / jnp.sqrt(cin)
        params.append(
            {
                "kernel": jax.random.uniform(k1, (cin, cout), dtype, -bound, bound),
                "bias": jax.random.uniform(k2, (cout,), dtype, -bound, bound),
            }
        )
    return params


def apply(params, x: jnp.ndarray) -> jnp.ndarray:
    """(B, 512) CLIP text embedding -> (B, 100) style embedding in (-1, 1)."""
    for i, p in enumerate(params):
        x = x @ p["kernel"] + p["bias"]
        if i < len(params) - 1:
            x = jax.nn.leaky_relu(x, negative_slope=0.2)
        else:
            x = jnp.tanh(x)
    return x


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
