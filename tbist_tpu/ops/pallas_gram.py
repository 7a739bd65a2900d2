"""Pallas TPU kernel: tiled Gram matrix with fused normalization + custom VJP.

The Gram matrices of the style loss (ops.losses.gram_matrix) contract a
(H·W, C) feature matrix into (C, C) — at 512px conv1_1 that is a
(262144, 64) reduction each of the ~400 optimization iterations, forward
and backward. This kernel:

* tiles the reduction dimension (rows of X) through VMEM with grid
  accumulation into a (C, C) fp32 scratch — one MXU ``dot`` per tile;
* fuses the ``1/(b·c·h·w)`` normalization into the epilogue;
* defines the analytic VJP ``dX = X (Ḡ + Ḡᵀ) / n`` as a second tiled
  kernel, so the backward pass never materializes intermediate grams.

Opt-in via ``TBIST_PALLAS_GRAM=1`` (requires TPU + lane-aligned channel
counts): in the full 512px Gatys loop XLA's fused einsum beats this
standalone kernel (56 vs 43 iters/s on v5e), so the einsum is the default.
Numerical parity vs the einsum is tested in
tests/test_aux.py::TestPallasGramParity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(n: int) -> int:
    for tile in (1024, 512, 256, 128, 64, 32, 16, 8):
        if n % tile == 0:
            return tile
    return n


def _gram_kernel(x_ref, out_ref, acc_ref, *, norm: float):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    acc_ref[:] += jax.lax.dot_general(
        x,
        x,
        dimension_numbers=(((0,), (0,)), ((), ())),  # xᵀ x over rows
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:] * norm


def _gram_fwd_pallas(x2d: jnp.ndarray, norm: float) -> jnp.ndarray:
    n, c = x2d.shape
    tile = _pick_tile(n)
    return pl.pallas_call(
        functools.partial(_gram_kernel, norm=norm),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * c * c, bytes_accessed=n * c * 4 + c * c * 4,
            transcendentals=0,
        ),
    )(x2d)


def _bwd_kernel(x_ref, m_ref, dx_ref):
    dx_ref[:] = jax.lax.dot_general(
        x_ref[:],
        m_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)


def _gram_bwd_pallas(x2d: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    n, c = x2d.shape
    tile = _pick_tile(n)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c), x2d.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * c * c, bytes_accessed=2 * n * c * 4 + c * c * 4,
            transcendentals=0,
        ),
    )(x2d, m)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def gram_2d(x2d: jnp.ndarray, norm: float) -> jnp.ndarray:
    """(N, C) features -> (C, C) fp32 gram, scaled by ``norm``."""
    return _gram_fwd_pallas(x2d, norm)


def _fwd(x2d, norm):
    return _gram_fwd_pallas(x2d, norm), x2d


def _bwd(norm, x2d, g):
    m = (g + g.T) * norm  # d/dX of tr(Ḡᵀ XᵀX)·norm
    return (_gram_bwd_pallas(x2d, m.astype(jnp.float32)),)


gram_2d.defvjp(_fwd, _bwd)


def supported(x: jnp.ndarray) -> bool:
    """Pallas path constraints: TPU backend, lane-aligned channels."""
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
    b, h, w, c = x.shape
    return on_tpu and b == 1 and c % 64 == 0 and (h * w) % 8 == 0


def gram_matrix(x: jnp.ndarray) -> jnp.ndarray:
    """Drop-in for ops.losses.gram_matrix on the Pallas path: NHWC -> (B, C, C)."""
    b, h, w, c = x.shape
    norm = 1.0 / (b * c * h * w)
    out = gram_2d(x.reshape(h * w, c), norm)
    return out[None]
