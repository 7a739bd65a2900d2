"""Pallas TPU kernel: fused backward for relu -> 2x2 max pool.

Round-2 measured that a Pallas pool-backward ALONE loses full-loop: the
custom-call boundary fences XLA's fusion/scheduling (11.1 -> 20.6 ms/iter)
even though the kernel wins in isolation (benchmarks/PROFILE.md). The r2
VERDICT's remaining suggestion is to make the fence pay for itself by
fusing MORE of the graph into the kernel — here the relu backward (and the
relu forward recompute) join the pool backward, so one custom call covers
what XLA otherwise does as pool-bwd fusions + relu-bwd + the {1,3,2,0}
layout transposes around them:

  x    = max(pre, 0)                       relu forward (recomputed in-kernel)
  eq   = (x == upsample(out))
  cnt  = eq + pair-swaps                   tie counting (2x2)
  gpre = (eq ? upsample(g) / cnt : 0) * (pre > 0)

Forward = XLA reshape-max over relu (fast); only the VJP is custom.
Opt-in via ``TBIST_PALLAS_RELU_POOL``: "1" fuses pool1 only (the 512px
64-channel site that dominates), "2" fuses every pool.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pool_fwd_math(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    return jnp.max(x.reshape(b, h // 2, 2, w // 2, 2, c), axis=(2, 4))


def _swap_pairs(a: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exchange each even/odd adjacent pair along ``axis`` (2x2 groups)."""
    n = a.shape[axis]
    nxt = pltpu.roll(a, shift=n - 1, axis=axis)  # result[i] = a[i+1]
    prv = pltpu.roll(a, shift=1, axis=axis)  # result[i] = a[i-1]
    par = jax.lax.broadcasted_iota(jnp.int32, a.shape, axis) % 2
    return jnp.where(par == 0, nxt, prv)


def _bwd_kernel(pre_ref, out_ref, g_ref, gpre_ref):
    pre = pre_ref[0]  # (2*TH2, W, C) pre-activation
    out = out_ref[0]  # (TH2, W2, C) pooled relu output
    g = g_ref[0]
    x = jnp.maximum(pre, 0.0)  # relu forward, recomputed in VMEM
    up_out = jnp.repeat(jnp.repeat(out, 2, axis=0), 2, axis=1)
    up_g = jnp.repeat(jnp.repeat(g, 2, axis=0), 2, axis=1)
    eq = (x == up_out).astype(x.dtype)
    cnt = (
        eq
        + _swap_pairs(eq, 0)
        + _swap_pairs(eq, 1)
        + _swap_pairs(_swap_pairs(eq, 0), 1)
    )
    relu_mask = (pre > 0.0).astype(x.dtype)  # jax.nn.relu: d/dx at 0 is 0
    gpre_ref[0] = eq * up_g / jnp.maximum(cnt, 1.0) * relu_mask


def _rows_per_block(h2: int, w: int, c: int, itemsize: int) -> int:
    lane_c = max(c, 128)
    per_row = 2 * w * lane_c * itemsize
    budget = 12 * 1024 * 1024
    th2 = max(1, budget // (8 * per_row))
    while h2 % th2:
        th2 -= 1
    return th2


@jax.jit
def _bwd_pallas(pre, out, g):
    b, h, w, c = pre.shape
    h2, w2 = h // 2, w // 2
    th2 = _rows_per_block(h2, w, c, pre.dtype.itemsize)
    grid = (b, h2 // th2)
    return pl.pallas_call(
        _bwd_kernel,
        out_shape=jax.ShapeDtypeStruct(pre.shape, pre.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 2 * th2, w, c), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, th2, w2, c), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, th2, w2, c), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 2 * th2, w, c), lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )(pre, out, g)


@jax.custom_vjp
def relu_max_pool_2x2_even(pre: jnp.ndarray) -> jnp.ndarray:
    """maxpool2x2(relu(pre)) for even-H/W NHWC, fused Pallas backward."""
    return _pool_fwd_math(jnp.maximum(pre, 0.0))


def _fwd(pre):
    out = _pool_fwd_math(jnp.maximum(pre, 0.0))
    return out, (pre, out)


def _bwd(res, g):
    pre, out = res
    return (_bwd_pallas(pre, out, g.astype(pre.dtype)),)


relu_max_pool_2x2_even.defvjp(_fwd, _bwd)


def supported(x: jnp.ndarray) -> bool:
    if x.ndim != 4 or x.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    b, h, w, c = x.shape
    if h % 2 or w % 2 or w < 2 or c < 1:
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
