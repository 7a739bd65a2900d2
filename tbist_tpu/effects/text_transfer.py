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


def compute_dtype():
    """Activation dtype for the feed-forward Ghiasi path.

    Default bf16: halving the activation bytes buys a consistent 5-9%
    on v5e — interleaved scalar-synced A/B: 11.5 vs 12.2 ms at batch 1,
    62.5 vs 68.5 ms at batch 8, 512px (benchmarks/PROFILE.md round-3f;
    an earlier −27% reading was axon host-link noise) — with output
    within 1 uint8 level of f32 on the seeded model (max |Δ| 0.0016,
    mean 1.5e-4 at 256px). Instance-norm statistics stay f32
    (models/ghiasi.py) and the final sigmoid returns f32 either way.
    ``TBIST_GHIASI_BF16=0`` opts out to the bit-f32 program (e.g. for
    golden regeneration). Read at trace time: flip the env var before
    the first call.
    """
    import os

    return (
        jnp.float32
        if os.environ.get("TBIST_GHIASI_BF16", "1") == "0"
        else jnp.bfloat16
    )


@functools.partial(jax.jit, static_argnames=("dtype",))
def _transfer_dtype_jit(g_params, m_params, image, text_embedding, dtype):
    style = clip_mlp.apply(m_params, text_embedding)
    return ghiasi.apply(g_params, image, style, compute_dtype=dtype)


def _transfer_jit(g_params, m_params, image, text_embedding):
    return _transfer_dtype_jit(
        g_params, m_params, image, text_embedding, compute_dtype()
    )


def _pooled_embedding(text: str, text_encoder) -> jnp.ndarray:
    """Prompt -> (1, 512) fp32 L2-normalized embedding
    (FastTextTransfer.py:52-56 semantics: mean over batch, fp32, L2)."""
    emb = text_encoder(text)
    emb = jnp.mean(emb.astype(jnp.float32), axis=0, keepdims=True)
    return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)


def perform_transfer_batch(
    images: jnp.ndarray,
    texts: list,
    g_params=None,
    m_params=None,
    text_encoder: Optional[Callable[[str], jnp.ndarray]] = None,
    pad_to_bucket: bool = True,
    use_mesh: bool = True,
) -> jnp.ndarray:
    """Batched ``perform_transfer``: N same-shape images, N prompts, ONE
    device program.

    The reference runs each request alone (torch eager,
    FastTextTransfer.py:36-66); here both sub-networks are batch-first
    ((B, H, W, 3) images × (B, 100) styles through the FiLM-conditioned
    Ghiasi transformer), so N concurrent serving requests cost one
    MXU-dense dispatch instead of N. Used by the cross-request
    micro-batcher (``tbist_tpu.api.batching``).

    ``pad_to_bucket`` pads the batch to the next power of two (repeating
    the last row) so the jit cache holds at most log2(max_batch) programs
    per image shape; the pad rows are sliced off before returning.

    With >1 visible device and ``use_mesh``, the batch shards over the
    production dp-only mesh (weights replicated) — same layout as the
    video path; dp introduces no cross-device reductions, so outputs
    match the unsharded program (tests/test_batching.py asserts it).
    """
    if images.ndim != 4 or images.shape[0] != len(texts):
        raise ValueError(
            f"images must be (N, H, W, 3) with N == len(texts); got "
            f"{images.shape} vs {len(texts)} prompts"
        )
    if g_params is None or m_params is None:
        g_params, m_params = default_params()
    if text_encoder is None:
        from tbist_tpu.models import clip_text

        text_encoder = clip_text.get_default_encoder()
    # One encode per unique prompt (repeated prompts are the common
    # serving case: same style text over many images).
    unique = {}
    for t in texts:
        if t not in unique:
            unique[t] = _pooled_embedding(t, text_encoder)
    emb = jnp.concatenate([unique[t] for t in texts], axis=0)  # (N, 512)

    mesh = None
    if use_mesh:
        from tbist_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.production_mesh(dp_only=True)

    n = images.shape[0]
    padded_n = n if not pad_to_bucket else max(1, 1 << (n - 1).bit_length())
    if mesh is not None:
        # sharded program shapes must tile evenly over dp
        dp = mesh.shape[mesh_lib.DP_AXIS]
        padded_n = -(-padded_n // dp) * dp
    if padded_n != n:
        from tbist_tpu.parallel.mesh import pad_to_multiple

        # n <= padded_n, so "next multiple of padded_n" is padded_n itself
        images, _ = pad_to_multiple(images, padded_n)
        emb, _ = pad_to_multiple(emb, padded_n)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        images = jax.device_put(images, mesh_lib.batch_sharding(mesh))
        emb = jax.device_put(emb, NamedSharding(mesh, P(mesh_lib.DP_AXIS, None)))
        g_params = jax.device_put(g_params, mesh_lib.replicated(mesh))
        m_params = jax.device_put(m_params, mesh_lib.replicated(mesh))
    out = _transfer_jit(g_params, m_params, images, emb)
    return out[:n]


def sp_min_width() -> int:
    """Width threshold for spatially sharding a SINGLE image over the sp
    axis. Below it the per-chip work is too small to amortize the conv
    halo exchanges; the default is sized for feed-forward Ghiasi where a
    512px image already runs in ~12 ms on one v5e chip (only one real
    chip is reachable in this environment, so the crossover cannot be
    measured — the mechanism is validated functionally on the virtual
    8-device mesh and the threshold kept conservative).
    ``TBIST_SP_MIN_WIDTH`` overrides (tests/dryrun use small widths)."""
    import os

    return int(os.environ.get("TBIST_SP_MIN_WIDTH", "1024"))


def perform_transfer(
    image: jnp.ndarray,
    text: str,
    g_params=None,
    m_params=None,
    text_encoder: Optional[Callable[[str], jnp.ndarray]] = None,
    use_mesh: bool = True,
) -> jnp.ndarray:
    """Apply the text style to an NHWC [0,1] image. Returns same shape.

    Matches the reference flow: embedding is mean-pooled, cast to fp32 and
    L2-normalized before the MLP (FastTextTransfer.py:52-56).

    With >1 visible device, ``use_mesh`` and width >= ``sp_min_width()``,
    the image's width axis shards over an sp-only production mesh
    (weights replicated): XLA GSPMD splits every Ghiasi conv spatially
    with automatic halo exchange and psums the instance-norm statistics,
    so ONE large image scales across the slice — the reference runs
    everything on one global device (app.py:51).
    """
    if g_params is None or m_params is None:
        g_params, m_params = default_params()
    if text_encoder is None:
        from tbist_tpu.models import clip_text

        text_encoder = clip_text.get_default_encoder()
    emb = _pooled_embedding(text, text_encoder)
    if use_mesh and image.ndim == 4 and image.shape[2] >= sp_min_width():
        from tbist_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.production_mesh(sp_only=True)
        # width must tile evenly over sp (shape buckets are multiples of
        # 64, so any 2/4/8-way slice divides; skip the odd remainder case
        # rather than pad — GSPMD padding would change the IN statistics)
        if mesh is not None and image.shape[2] % mesh.shape[mesh_lib.SP_AXIS] == 0:
            image = jax.device_put(image, mesh_lib.single_image_sharding(mesh))
            g_params = jax.device_put(g_params, mesh_lib.replicated(mesh))
            m_params = jax.device_put(m_params, mesh_lib.replicated(mesh))
            emb = jax.device_put(emb, mesh_lib.replicated(mesh))
    return _transfer_jit(g_params, m_params, image, emb)
