"""SE-style channel attention (working version of the reference's).

The reference ``ChannelAttention`` can never run — ``super()._init_()``
is a typo that crashes on instantiation (multi_style_transfer/
ChannelAttention.py:11) and its weights were random per call anyway
(run_style_transfer.py:18). We implement the *intended* behavior:
squeeze-excite with reduction 2, ReLU after both FCs, then sigmoid
(ChannelAttention.py:23-40), with deterministic seeded init so runs are
reproducible.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def _init_params_impl(key: jax.Array, channels: int, reduction: int = 2) -> Dict:
    k1, k2 = jax.random.split(key)
    hidden = channels // reduction
    # torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    b1 = 1.0 / jnp.sqrt(channels)
    b2 = 1.0 / jnp.sqrt(hidden)
    return {
        "fc1": jax.random.uniform(k1, (channels, hidden), minval=-b1, maxval=b1),
        "fc2": jax.random.uniform(k2, (hidden, channels), minval=-b2, maxval=b2),
    }


def apply(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, H, W, C) -> channel-reweighted (B, H, W, C)."""
    pooled = jnp.mean(x, axis=(1, 2))  # (B, C)
    h = jax.nn.relu(pooled @ params["fc1"])
    h = jax.nn.relu(h @ params["fc2"])
    scale = jax.nn.sigmoid(h)  # (B, C)
    return x * scale[:, None, None, :]


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
