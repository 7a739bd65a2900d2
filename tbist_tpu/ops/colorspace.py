"""Color-space transforms: Reinhard lαβ transfer and grayscale.

Reference: color_palette/ColorPaletteTransfer.py (Reinhard et al. 2001) and
the PIL ``convert("L")`` grayscale at app.py:159. Everything here is pure
jnp on NHWC arrays in [0, 1]; the 3×3 color matrices are tiny matmuls that
XLA fuses into the surrounding elementwise ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# RGB -> LMS (ColorPaletteTransfer.py:15-18)
RGB_TO_LMS = np.array(
    [
        [0.3811, 0.5783, 0.0402],
        [0.1967, 0.7244, 0.0782],
        [0.0241, 0.1288, 0.8444],
    ],
    dtype=np.float32,
)
# log-LMS -> Ruderman lαβ (ColorPaletteTransfer.py:19-22)
LMS_TO_RUDERMAN = np.array(
    [
        [1 / np.sqrt(3), 1 / np.sqrt(3), 1 / np.sqrt(3)],
        [1 / np.sqrt(6), 1 / np.sqrt(6), -2 / np.sqrt(6)],
        [1 / np.sqrt(2), -1 / np.sqrt(2), 0.0],
    ],
    dtype=np.float32,
)
RUDERMAN_TO_LMS = np.linalg.inv(LMS_TO_RUDERMAN).astype(np.float32)
LMS_TO_RGB = np.linalg.inv(RGB_TO_LMS).astype(np.float32)

_LOG_EPS = 1e-5  # ColorPaletteTransfer.py:104


def _mm(x: jnp.ndarray, m: np.ndarray) -> jnp.ndarray:
    # 3x3 color matrices must multiply in full fp32: JAX's default matmul
    # precision uses bf16 passes (fine for the big conv/Gram path, visibly
    # lossy for chained colorspace transforms).
    return jnp.matmul(
        x, jnp.asarray(m.T, x.dtype), precision=jax.lax.Precision.HIGHEST
    )


def rgb_to_ruderman(img: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) RGB in [~0, 1] -> Ruderman lαβ."""
    lms_log = jnp.log(_mm(img, RGB_TO_LMS) + _LOG_EPS)
    return _mm(lms_log, LMS_TO_RUDERMAN)


def ruderman_to_rgb(lab: jnp.ndarray) -> jnp.ndarray:
    """Ruderman lαβ -> (..., 3) RGB (un-clamped)."""
    lms = jnp.exp(_mm(lab, RUDERMAN_TO_LMS))
    return _mm(lms, LMS_TO_RGB)


def reinhard_color_transfer(
    source: jnp.ndarray,
    target: jnp.ndarray,
    clip_min: float = 1e-6,
    std_floor: float = 1e-5,
) -> jnp.ndarray:
    """Transfer the color statistics of ``target`` onto ``source``.

    Both are NHWC RGB in [0, 1]; the result is clamped to [0, 1].
    Per-channel mean/std are matched in lαβ space with the source std
    floored at ``std_floor`` (ColorPaletteTransfer.py:60-89). ``target``
    may have any spatial shape — only its statistics are used, so unlike
    the reference (which bilinearly resizes target to source shape,
    :42-44) no resize is needed; statistics over the resized image differ
    negligibly and this saves a full-image gather on device.
    """
    src = jnp.clip(source, clip_min, 1.0)
    tgt = jnp.clip(target, clip_min, 1.0)

    src_lab = rgb_to_ruderman(src)
    tgt_lab = rgb_to_ruderman(tgt)

    # source statistics are per-IMAGE: a batched (B, H, W, 3) source
    # matches B independent transfers exactly (the video lane sends whole
    # frame chunks through one program), and at B=1 this reduces over the
    # same elements as an all-axes reduction. The target is a single
    # reference image, so its stats stay pooled over every pixel.
    if src_lab.ndim >= 4:
        axes = tuple(range(1, src_lab.ndim - 1))
        n_src = np.prod(src_lab.shape[1:-1])
    else:
        axes = tuple(range(src_lab.ndim - 1))
        n_src = np.prod(src_lab.shape[:-1])
    src_mean = jnp.mean(src_lab, axis=axes, keepdims=True)
    # torch .std() is the unbiased (ddof=1) estimator
    n_tgt = np.prod(tgt_lab.shape[:-1])
    src_std = jnp.std(src_lab, axis=axes, keepdims=True) * jnp.sqrt(
        n_src / max(n_src - 1, 1)
    )
    tgt_mean = jnp.mean(tgt_lab, axis=tuple(range(tgt_lab.ndim - 1)), keepdims=True)
    tgt_std = jnp.std(
        tgt_lab, axis=tuple(range(tgt_lab.ndim - 1)), keepdims=True
    ) * jnp.sqrt(n_tgt / max(n_tgt - 1, 1))

    src_std = jnp.where(src_std < std_floor, jnp.ones_like(src_std), src_std)

    out_lab = (src_lab - src_mean) * (tgt_std / src_std) + tgt_mean.reshape(
        (1,) * (src_lab.ndim - 1) + (3,)
    )
    out = ruderman_to_rgb(out_lab)
    return jnp.clip(out, 0.0, 1.0)


# ITU-R 601-2 luma — PIL Image.convert("L") semantics (app.py:159)
_LUMA = np.array([299.0, 587.0, 114.0], dtype=np.float32) / 1000.0


def rgb_to_grayscale(img: jnp.ndarray, keep_rgb: bool = True) -> jnp.ndarray:
    """PIL-parity grayscale. ``keep_rgb`` replicates luma to 3 channels."""
    luma = jnp.matmul(
        img, jnp.asarray(_LUMA, img.dtype), precision=jax.lax.Precision.HIGHEST
    )
    luma = luma[..., None]
    if keep_rgb:
        luma = jnp.repeat(luma, 3, axis=-1)
    return luma
