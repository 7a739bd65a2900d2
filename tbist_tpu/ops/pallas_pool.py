"""Pallas TPU kernel: fused backward for 2x2 max pooling.

The VGG trunk's pool BACKWARD is ~1.5-2.7 ms/iter of the 512px Gatys loop
whichever way XLA derives it (benchmarks/PROFILE.md measured three
formulations: auto reshape-max VJP materializes two 5D broadcast tensors +
layout copies; select_and_scatter is a slow native op; stride-2 slices are
lane-hostile). This kernel computes the gradient in ONE pass over the
input at its native (sublane=W, lane=C) layout:

  eq   = (x == upsample(out))                       elementwise
  cnt  = eq + pair-swapped(eq, H) + pair-swapped(eq, W) + both
  gx   = eq ? upsample(g) / cnt : 0

Pair-swapping adjacent rows/columns is two circular rolls + a parity
select — no stride-2 memory access, no 5D intermediates. Tie gradients
split evenly among maxima, exactly matching jax's reduce_max VJP (the
semantics the golden arrays encode; ties are common because ReLU zeros).

Forward stays the XLA reshape-max (it is fast); only the VJP is custom.

STATUS — opt-in via ``TBIST_PALLAS_POOL=1``, measured r2 on v5e:
in ISOLATION this kernel beats XLA's automatic VJP at conv1 size (2.07 vs
2.30 ms fwd+bwd), but inside the full 512px Gatys program the custom-call
boundary fences XLA's fusion/scheduling and the WHOLE loop slows from
11.1 to 20.6 ms/iter. Same toolchain lesson as the L-BFGS lax.cond
(optimize/lbfgs.py) in the opposite direction: scheduling effects dwarf
kernel-local wins. Numerical parity (incl. tie splitting) is exact —
tests/test_aux.py::TestPallasPoolParity.
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
    # pltpu.roll requires shift >= 0: shift n-1 == circular shift -1
    nxt = pltpu.roll(a, shift=n - 1, axis=axis)  # result[i] = a[i+1]
    prv = pltpu.roll(a, shift=1, axis=axis)  # result[i] = a[i-1]
    par = jax.lax.broadcasted_iota(jnp.int32, a.shape, axis) % 2
    return jnp.where(par == 0, nxt, prv)


def _bwd_kernel(x_ref, out_ref, g_ref, gx_ref):
    x = x_ref[0]  # (2*TH2, W, C)
    out = out_ref[0]  # (TH2, W2, C)
    g = g_ref[0]
    up_out = jnp.repeat(jnp.repeat(out, 2, axis=0), 2, axis=1)
    up_g = jnp.repeat(jnp.repeat(g, 2, axis=0), 2, axis=1)
    eq = (x == up_out).astype(x.dtype)
    cnt = (
        eq
        + _swap_pairs(eq, 0)
        + _swap_pairs(eq, 1)
        + _swap_pairs(_swap_pairs(eq, 0), 1)
    )
    gx_ref[0] = eq * up_g / jnp.maximum(cnt, 1.0)


def _rows_per_block(h2: int, w: int, c: int, itemsize: int) -> int:
    """Pick TH2 (pooled rows per grid step) within the VMEM budget.

    The kernel materializes ~8 x-block-sized values (x, gx, eq, cnt,
    up_out, up_g, roll temporaries) in the 16 MB VMEM."""
    lane_c = max(c, 128)  # lane padding for C < 128
    per_row = 2 * w * lane_c * itemsize  # one pooled row = 2 input rows
    budget = 12 * 1024 * 1024
    th2 = max(1, budget // (8 * per_row))
    while h2 % th2:
        th2 -= 1
    return th2


@functools.partial(jax.jit, static_argnames=())
def _bwd_pallas(x, out, g):
    b, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    th2 = _rows_per_block(h2, w, c, x.dtype.itemsize)
    grid = (b, h2 // th2)
    return pl.pallas_call(
        _bwd_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
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
    )(x, out, g)


@jax.custom_vjp
def max_pool_2x2_even(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 max pool of an even-H/W NHWC array, Pallas backward."""
    return _pool_fwd_math(x)


def _fwd(x):
    out = _pool_fwd_math(x)
    return out, (x, out)


def _bwd(res, g):
    x, out = res
    return (_bwd_pallas(x, out, g.astype(x.dtype)),)


max_pool_2x2_even.defvjp(_fwd, _bwd)


def supported(x: jnp.ndarray) -> bool:
    """Pallas path preconditions: TPU backend, 4D, even H/W, f32/bf16."""
    if x.ndim != 4 or x.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    b, h, w, c = x.shape
    if h % 2 or w % 2 or w < 2 or c < 1:
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
