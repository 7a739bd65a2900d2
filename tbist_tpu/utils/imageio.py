"""Host-side image I/O and the host↔device boundary.

PIL stays on the host; device arrays are float32/bfloat16 NHWC in [0, 1].
The reference keeps images as PIL/np.uint8 HWC and converts per component
(e.g. run_style_transfer.py:5-11); here conversion happens exactly once at
the boundary.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np
from PIL import Image

ArrayLike = Union[np.ndarray, "jnp.ndarray"]


def load_image(path: str) -> Image.Image:
    """Open an image file as RGB PIL (host)."""
    return Image.open(path).convert("RGB")


def to_float(image: Union[Image.Image, np.ndarray]) -> np.ndarray:
    """PIL/uint8 HWC -> float32 HWC in [0, 1] (host-side, numpy)."""
    arr = np.asarray(image)
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    else:
        arr = arr.astype(np.float32)
    if arr.ndim == 2:
        arr = arr[..., None]
    if arr.shape[-1] == 4:  # drop alpha, matching reference `[:3]` slices
        arr = arr[..., :3]
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    return arr


def to_uint8(arr: ArrayLike) -> np.ndarray:
    """float [0,1] -> uint8, clipping. Accepts HWC or NHWC (squeezes N=1).
    Idempotent: uint8 input (e.g. already quantized on device) passes
    through unscaled."""
    arr = np.asarray(arr)
    if arr.ndim == 4 and arr.shape[0] == 1:
        arr = arr[0]
    if arr.dtype == np.uint8:
        return arr
    return np.clip(np.round(arr * 255.0), 0, 255).astype(np.uint8)


def to_pil(arr: ArrayLike) -> Image.Image:
    """Device/host float array -> PIL RGB (or L for single channel)."""
    u8 = to_uint8(arr)
    if u8.ndim == 3 and u8.shape[-1] == 1:
        u8 = u8[..., 0]
    return Image.fromarray(u8)


def save_image(arr: ArrayLike, path: str) -> None:
    to_pil(arr).save(path)


def bucket_shape(
    h: int, w: int, bucket: int = 32, max_side: Optional[int] = None
) -> Tuple[int, int]:
    """Static-shape policy: round (h, w) to multiples of ``bucket``.

    The reference runs native-resolution images through VGG (SURVEY §5
    "long-context" note); under XLA every distinct shape is a fresh
    compilation, so we quantize. Rounding is to the *nearest* multiple
    (minimum one bucket) — a sub-2% resize at 512px, visually lossless.
    """
    if max_side is not None and max(h, w) > max_side:
        scale = max_side / max(h, w)
        h, w = int(round(h * scale)), int(round(w * scale))
    bh = max(bucket, int(round(h / bucket)) * bucket)
    bw = max(bucket, int(round(w / bucket)) * bucket)
    return bh, bw


def to_device(
    image: Union[Image.Image, np.ndarray],
    bucket: Optional[int] = None,
    max_side: Optional[int] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Host image -> device NHWC float in [0,1], optionally shape-bucketed."""
    arr = to_float(image)
    x = jnp.asarray(arr, dtype=dtype)[None, ...]
    if bucket is not None:
        h, w = x.shape[1], x.shape[2]
        bh, bw = bucket_shape(h, w, bucket, max_side)
        if (bh, bw) != (h, w):
            import jax

            x = jax.image.resize(x, (1, bh, bw, x.shape[3]), method="bilinear")
    return x


def to_uint8_device(x: "jnp.ndarray") -> "jnp.ndarray":
    """float [0,1] -> uint8 ON DEVICE, exact ``to_uint8`` semantics
    (clip(round(x*255))). Fetching uint8 moves 4x fewer bytes through
    the ~31 MB/s axon host link than f32 (benchmarks/PROFILE.md
    round-3e). bf16 inputs are widened to f32 first so quantization
    matches the host path bit-for-bit (bf16 has ~1 ulp at 255)."""
    x = x.astype(jnp.float32)
    return jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.uint8)


def from_device(x: ArrayLike) -> Image.Image:
    """Device NHWC float -> PIL image (host). Float DEVICE arrays
    quantize to uint8 on device before the fetch; ``to_uint8``'s uint8
    passthrough keeps the bytes identical to host-side quantization."""
    if isinstance(x, jnp.ndarray) and jnp.issubdtype(x.dtype, jnp.floating):
        x = to_uint8_device(x)
    return to_pil(np.asarray(x))
