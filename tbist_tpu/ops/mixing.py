"""Two-style feature fusion (reference multi_style_transfer/StyleMixer.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _midpoint_shape(s1, s2, exact_reference: bool):
    if exact_reference:
        # Reproduces the reference precedence bug `a + b // 2`
        # (StyleMixer.py:31-32) behind a flag, for output-parity checks.
        return tuple(int(a) + int(b) // 2 for a, b in zip(s1, s2))
    return tuple((int(a) + int(b)) // 2 for a, b in zip(s1, s2))


def mix_features(
    feat1: jnp.ndarray,
    feat2: jnp.ndarray,
    weight2: float,
    exact_reference: bool = False,
) -> jnp.ndarray:
    """Bilinear-resize two NHWC feature maps to a midpoint (H, W) and blend.

    ``weight2`` is the weight of ``feat2``; ``feat1`` gets ``1 - weight2``
    (reference StyleMixer.py:23,37). The intended midpoint ``(a + b) // 2``
    is the default; ``exact_reference=True`` reproduces the reference's
    ~1.5× shape (documented divergence, SURVEY §2.2 item 2).
    """
    h, w = _midpoint_shape(feat1.shape[1:3], feat2.shape[1:3], exact_reference)
    b, _, _, c = feat1.shape
    f1 = jax.image.resize(feat1, (b, h, w, c), method="bilinear")
    f2 = jax.image.resize(feat2, (feat2.shape[0], h, w, feat2.shape[3]), method="bilinear")
    return (1.0 - weight2) * f1 + weight2 * f2
