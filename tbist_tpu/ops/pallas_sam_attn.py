"""Pallas TPU kernel: SAM global attention with decomposed rel-pos bias.

The SAM ViT-B encoder's four global-attention layers each materialize a
(heads, 4096, 4096) attention matrix plus the decomposed relative-position
bias in HBM — ~5 GB of traffic per layer, over half the encoder's device
time (benchmarks/PROFILE.md round-2f). This kernel keeps the whole
(q-tile, T) logits row-block in VMEM:

* per (head, q-tile) grid step: one MXU ``q @ kᵀ``, the decomposed bias
  reconstructed from its factored (T, h)/(T, w) forms by two tiny selector
  matmuls (bias_h is constant across k's column index, bias_w across k's
  row index — the same structure the official ``add_decomposed_rel_pos``
  exploits), softmax, and ``attn @ v`` — logits never touch HBM;
* k/v/selector blocks are indexed by head only, so Pallas re-uses them
  across consecutive q-tile steps without re-copying.

HBM traffic per layer drops from ~5 GB to ~25 MB (q/k/v/bias/out).
Inference-only (no custom VJP) — SAM runs under no_grad in the reference
(text/subnetworks/segment_anything_object_segmenter.py:21-43).
Numerical parity vs the einsum formulation is tested in
tests/test_aux.py::TestPallasSamAttnParity (interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, bh_ref, bw_ref, sh_ref, sw_ref, o_ref):
    q = q_ref[0]  # (QT, d) — pre-scaled
    logits = jax.lax.dot_general(
        q, k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (QT, T)
    logits += jnp.dot(bh_ref[0], sh_ref[:], preferred_element_type=jnp.float32)
    logits += jnp.dot(bw_ref[0], sw_ref[:], preferred_element_type=jnp.float32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(attn, v_ref[0], preferred_element_type=jnp.float32)


def _pick_tile(t: int) -> int:
    # 128 keeps the (QT, T) logits + exp intermediates ~4 MB — within the
    # 16 MB scoped-vmem budget next to the k/v/bias/selector blocks
    for tile in (128, 64, 32, 16, 8):
        if t % tile == 0:
            return tile
    return t


def attention_with_rel_bias(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias_h: jnp.ndarray,
    bias_w: jnp.ndarray,
    h: int,
    w: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """q (pre-scaled), k, v: (N, T, d); bias_h: (N, T, h); bias_w: (N, T, w)
    with T = h·w in row-major (y, x) order. Returns softmax(q kᵀ + bias) v
    where bias[i, j] = bias_h[i, j // w] + bias_w[i, j % w].
    """
    n, t, d = q.shape
    qt = _pick_tile(t)

    j = jnp.arange(t)
    sel_h = (j[None, :] // w == jnp.arange(h)[:, None]).astype(jnp.float32)
    sel_w = (j[None, :] % w == jnp.arange(w)[:, None]).astype(jnp.float32)

    head_block = lambda ni, qi: (ni, 0, 0)
    qtile_block = lambda ni, qi: (ni, qi, 0)
    return pl.pallas_call(
        _kernel,
        grid=(n, t // qt),
        in_specs=[
            pl.BlockSpec((1, qt, d), qtile_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), head_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), head_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qt, h), qtile_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qt, w), qtile_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, t), lambda ni, qi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, t), lambda ni, qi: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qt, d), qtile_block, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * t * t * d,
            bytes_accessed=4 * (3 * n * t * d + n * t * (h + w) + n * t * d),
            transcendentals=n * t * t,
        ),
        interpret=interpret,
    )(q, k, v, bias_h, bias_w, sel_h, sel_w)
