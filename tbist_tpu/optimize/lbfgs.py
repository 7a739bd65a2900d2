"""L-BFGS in pure JAX, semantics-compatible with ``torch.optim.LBFGS``.

The reference drives its 400-iteration pixel optimization with torch LBFGS
at defaults (run_style_transfer.py:90): **no line search**, lr=1, first
step scaled by ``min(1, 1/||g||_1)``, history of (s, y) pairs skipped when
curvature ``y·s <= 1e-10``. One iteration = one loss/grad evaluation, which
is what the iters/sec benchmark counts.

This implementation keeps a fixed-shape circular-buffer history (static
memory size, masked slots) and computes the inverse-Hessian product with
the Byrd-Nocedal-Schnabel COMPACT representation rather than the classic
two-loop recursion: a handful of contractions and one (m, m) triangular
system replace 2m latency-bound sequential (dot, axpy) chains —
mathematically identical (verified against torch trajectories in
tests/test_lbfgs.py). Fully jit-compatible, so the whole optimization runs
inside a single ``lax.fori_loop`` on device.

The parameter/gradient may have ANY shape: history rows share the
gradient's native shape, so callers never flatten. (Flattening a NHWC
image gradient to (N,) forced XLA layout-conversion copies worth
~0.75 ms/iter at 512px on v5e — see the round-2 profile in
benchmarks/PROFILE.md.)
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp


class LBFGSState(NamedTuple):
    step: jnp.ndarray  # int32 iteration counter
    s_hist: jnp.ndarray  # (m, *shape) parameter differences
    y_hist: jnp.ndarray  # (m, *shape) gradient differences
    rho: jnp.ndarray  # (m,) 1/(y·s); 0 marks an invalid slot
    prev_grad: jnp.ndarray  # (*shape,)
    prev_step_vec: jnp.ndarray  # (*shape,) t*d actually applied last iteration
    gamma: jnp.ndarray  # H0 scaling (y·s)/(y·y)


def init_state(
    shape: Union[int, Tuple[int, ...]], memory_size: int, dtype=jnp.float32
) -> LBFGSState:
    """``shape`` is the parameter shape (an int keeps the legacy flat form)."""
    if isinstance(shape, int):
        shape = (shape,)
    m = memory_size
    return LBFGSState(
        step=jnp.zeros((), jnp.int32),
        s_hist=jnp.zeros((m, *shape), dtype),
        y_hist=jnp.zeros((m, *shape), dtype),
        rho=jnp.zeros((m,), dtype),
        prev_grad=jnp.zeros(shape, dtype),
        prev_step_vec=jnp.zeros(shape, dtype),
        gamma=jnp.ones((), dtype),
    )


def _vdot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full contraction of same-shaped arrays, exact accumulation."""
    return jnp.sum(a * b, dtype=a.dtype)


def _hist_dot(hist: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(m, *shape) x (*shape) -> (m,); layout-preserving contraction."""
    return jnp.sum(hist * v[None], axis=tuple(range(1, hist.ndim)))


def _hist_outer(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(m, *shape) x (m, *shape) -> (m, m); contracts all trailing dims."""
    axes = list(range(1, a.ndim))
    return jnp.einsum(
        a, [0, *axes], b, [a.ndim, *axes], [0, a.ndim],
        precision=jax.lax.Precision.HIGHEST,
    )


def _hist_combine(coeff: jnp.ndarray, hist: jnp.ndarray) -> jnp.ndarray:
    """(m,) x (m, *shape) -> (*shape,); weighted sum of history rows."""
    c = coeff.reshape((-1,) + (1,) * (hist.ndim - 1))
    return jnp.sum(c * hist, axis=0)


def _bhist_dot(hist: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(B, m, *shape) x (B, *shape) -> (B, m); layout-preserving."""
    return jnp.sum(hist * v[:, None], axis=tuple(range(2, hist.ndim)))


def _bhist_outer(a: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """(B, m, *shape) x (B, m, *shape) -> (B, m, m); contracts all
    trailing dims, native shape (no flatten — see ``update_batch``)."""
    axes = list(range(2, a.ndim))
    return jnp.einsum(
        a, [0, 1, *axes], c, [0, a.ndim, *axes], [0, 1, a.ndim],
        precision=jax.lax.Precision.HIGHEST,
    )


def _bhist_combine(coeff: jnp.ndarray, hist: jnp.ndarray) -> jnp.ndarray:
    """(B, m) x (B, m, *shape) -> (B, *shape); weighted row sums."""
    c = coeff.reshape(coeff.shape + (1,) * (hist.ndim - 2))
    return jnp.sum(c * hist, axis=1)


@functools.partial(jax.jit, donate_argnames=("state",))
def update(
    grad: jnp.ndarray, state: LBFGSState, lr: float = 1.0
) -> Tuple[jnp.ndarray, LBFGSState]:
    """One L-BFGS step. Returns (update_vector, new_state).

    ``update_vector`` is the additive parameter update (t * direction),
    shaped like ``grad``.
    """
    m = state.s_hist.shape[0]
    g = grad

    def first_step(state):
        # torch: t = min(1, 1/||g||_1) * lr ; d = -g
        t = jnp.minimum(1.0, 1.0 / jnp.sum(jnp.abs(g))) * lr
        return -t * g, state

    def later_step(state):
        s = state.prev_step_vec
        y = g - state.prev_grad
        ys = _vdot(y, s)
        valid = ys > 1e-10

        slot = (state.step - 1) % m
        # Masked ROW update (3 MB) instead of a whole-buffer select (2x31 MB
        # at 512px): compose the new row first, then one in-place
        # dynamic-update-slice on the donated buffer.
        old_s = jax.lax.dynamic_index_in_dim(state.s_hist, slot, 0)
        old_y = jax.lax.dynamic_index_in_dim(state.y_hist, slot, 0)
        s_hist = jax.lax.dynamic_update_slice_in_dim(
            state.s_hist, jnp.where(valid, s[None], old_s), slot, 0
        )
        y_hist = jax.lax.dynamic_update_slice_in_dim(
            state.y_hist, jnp.where(valid, y[None], old_y), slot, 0
        )
        rho = state.rho.at[slot].set(
            jnp.where(valid, 1.0 / ys, state.rho[slot])
        )
        gamma = jnp.where(valid, ys / _vdot(y, y), state.gamma)

        # Compact representation (Byrd-Nocedal-Schnabel 1994) instead of the
        # two-loop recursion: mathematically the SAME inverse-Hessian
        # product, but the 2m sequential (dot, axpy) chains become a few
        # parallel contractions + an (m, m) solve. Verified against torch
        # trajectories in tests/test_lbfgs.py.
        #
        #   H g = g*gamma + S^T[R^-T((D + gamma*YY^T)R^-1 Sg - gamma*Yg)]
        #         - gamma*Y^T(R^-1 Sg)
        #
        # with rows of S/Y in circular-buffer order; chronological ordering
        # enters only through the triangular mask of R. Invalid slots
        # (rho == 0) have all-zero S/Y rows and identity diagonal in R/D,
        # so they contribute exactly nothing.
        #
        # NOTE the surrounding lax.cond is ALSO a performance fence: letting
        # XLA fuse this block into the main Gatys program doubles the whole
        # loop's iteration time (measured 22.9 vs 12.7 ms/iter at 512px on
        # v5e) — keep the branch even though step==0 is taken only once.
        valid_slots = rho != 0.0
        SY = _hist_outer(s_hist, y_hist)  # (m, m)
        YY = _hist_outer(y_hist, y_hist)
        # chronological position of each buffer row (newest == m-1)
        chrono = (jnp.arange(m) - slot - 1) % m
        keep = chrono[:, None] <= chrono[None, :]
        eye = jnp.eye(m, dtype=g.dtype)
        diag_fix = jnp.where(valid_slots, 0.0, 1.0)
        R = jnp.where(keep, SY, 0.0) + diag_fix * eye
        d_tilde = jnp.where(valid_slots, jnp.diagonal(SY), 1.0)

        Sg = _hist_dot(s_hist, g)  # (m,)
        Yg = _hist_dot(y_hist, g)
        p = jnp.linalg.solve(R, Sg)  # R^-1 Sg  (10x10 -- negligible)
        w = d_tilde * p + gamma * (YY @ p) - gamma * Yg
        u = jnp.linalg.solve(R.T, w)  # R^-T w
        r_vec = gamma * g + _hist_combine(u, s_hist) - gamma * _hist_combine(
            p, y_hist
        )

        new_state = state._replace(
            s_hist=s_hist, y_hist=y_hist, rho=rho, gamma=gamma
        )
        return -lr * r_vec, new_state

    step_vec, state = jax.lax.cond(state.step == 0, first_step, later_step, state)
    state = state._replace(
        step=state.step + 1, prev_grad=g, prev_step_vec=step_vec
    )
    return step_vec, state


def init_batch_state(
    batch: int,
    shape: Union[int, Tuple[int, ...]],
    memory_size: int,
    dtype=jnp.float32,
) -> LBFGSState:
    """Batch-first state for ``update_batch``: history leaves carry a
    leading (B,) lane axis, but ``step`` is ONE shared scalar — the B
    independent optimizations advance in lockstep (that is exactly what
    a batched ``fori_loop`` does anyway), and a scalar counter is what
    keeps the step-0 branch a real ``lax.cond`` (see ``update_batch``).
    """
    if isinstance(shape, int):
        shape = (shape,)
    m = memory_size
    return LBFGSState(
        step=jnp.zeros((), jnp.int32),
        s_hist=jnp.zeros((batch, m, *shape), dtype),
        y_hist=jnp.zeros((batch, m, *shape), dtype),
        rho=jnp.zeros((batch, m), dtype),
        prev_grad=jnp.zeros((batch, *shape), dtype),
        prev_step_vec=jnp.zeros((batch, *shape), dtype),
        gamma=jnp.ones((batch,), dtype),
    )


@functools.partial(jax.jit, donate_argnames=("state",))
def update_batch(
    grads: jnp.ndarray, state: LBFGSState, lr: float = 1.0
) -> Tuple[jnp.ndarray, LBFGSState]:
    """One L-BFGS step for B independent lockstep optimizations.

    Per lane this is the same math as ``update`` (torch-LBFGS-default
    semantics; parity-tested against ``jax.vmap(update)`` in
    tests/test_lbfgs.py) — but it is NOT implemented as ``vmap(update)``,
    which on TPU costs ~4x per frame at B=1 (51 vs 12 ms/step at 512px,
    benchmarks/PROFILE.md round-3h):

    * vmap turns the per-lane ``step == 0`` predicate into a batched
      ``select`` that executes BOTH branches every iteration and
      dissolves the lax.cond fusion fence the single path relies on
      (lbfgs.py ``update`` NOTE). Here ``step`` and the circular-buffer
      ``slot`` are SHARED scalars, so the cond survives.
    * per-lane slot indices turn the history row write into a scatter
      and the row read into a gather; a scalar slot keeps them plain
      dynamic slices on axis 1.

    The cond fence cuts BOTH ways: its operands include the whole
    (B, m, *shape) history, and materializing that across the fence
    grows with B while the fence's fusion win does not — measured
    crossover is between B=2 and B=4 at 512px (round-3h table), so
    ``parallel/batched.py`` selects this formulation only for small
    batches (``_lbfgs_update``) and ``vmap(update)`` above the
    threshold. An unfenced shared-slot variant (cond removed) loses at
    EVERY batch size — the fence, not the branch choice, is what keeps
    the compact block on the MXU.

    All contractions keep the gradient's NATIVE trailing shape (the
    same rule as ``update``; flattening to (B, m, n) would not only
    reintroduce layout copies but also merge the sp-sharded width axis,
    forcing an all-gather and changing the partitioned reduction order —
    measured as an 0.077 sharded-vs-unsharded drift after 2 steps on an
    sp mesh, vs 1e-3-level agreement with native-shape contractions).
    """
    b = grads.shape[0]
    m = state.s_hist.shape[1]
    g = grads
    lanes = tuple(range(1, g.ndim))  # per-lane contraction axes

    def _bdot(a, c):  # (B, *shape) x (B, *shape) -> (B,)
        return jnp.sum(a * c, axis=lanes, dtype=a.dtype)

    def _col(v):  # (B,) -> broadcastable over (B, *shape)
        return v.reshape((b,) + (1,) * (g.ndim - 1))

    def first_step(state):
        t = jnp.minimum(1.0, 1.0 / jnp.sum(jnp.abs(g), axis=lanes)) * lr
        return -_col(t) * g, state

    def later_step(state):
        s = state.prev_step_vec
        y = g - state.prev_grad
        ys = _bdot(y, s)  # (B,)
        valid = ys > 1e-10

        slot = (state.step - 1) % m  # SHARED scalar slot
        old_s = jax.lax.dynamic_slice_in_dim(state.s_hist, slot, 1, axis=1)
        old_y = jax.lax.dynamic_slice_in_dim(state.y_hist, slot, 1, axis=1)
        vrow = valid.reshape((b,) + (1,) * g.ndim)
        s_hist = jax.lax.dynamic_update_slice_in_dim(
            state.s_hist, jnp.where(vrow, s[:, None], old_s), slot, axis=1
        )
        y_hist = jax.lax.dynamic_update_slice_in_dim(
            state.y_hist, jnp.where(vrow, y[:, None], old_y), slot, axis=1
        )
        old_rho = jax.lax.dynamic_slice_in_dim(state.rho, slot, 1, axis=1)
        rho = jax.lax.dynamic_update_slice_in_dim(
            state.rho,
            jnp.where(valid, 1.0 / ys, old_rho[:, 0])[:, None],
            slot,
            axis=1,
        )
        gamma = jnp.where(valid, ys / _bdot(y, y), state.gamma)  # (B,)

        # Same compact representation as ``update``, batched on the lane
        # axis; history rows keep the gradient's native trailing shape.
        SY = _bhist_outer(s_hist, y_hist)  # (B, m, m)
        YY = _bhist_outer(y_hist, y_hist)

        valid_slots = rho != 0.0  # (B, m)
        chrono = (jnp.arange(m) - slot - 1) % m  # shared (m,)
        keep = chrono[:, None] <= chrono[None, :]
        eye = jnp.eye(m, dtype=g.dtype)
        diag_fix = jnp.where(valid_slots, 0.0, 1.0)  # (B, m)
        R = jnp.where(keep, SY, 0.0) + diag_fix[:, :, None] * eye
        d_tilde = jnp.where(
            valid_slots, jnp.diagonal(SY, axis1=1, axis2=2), 1.0
        )

        Sg = _bhist_dot(s_hist, g)  # (B, m)
        Yg = _bhist_dot(y_hist, g)
        p = jnp.linalg.solve(R, Sg[..., None])[..., 0]  # (B, m)
        w = (
            d_tilde * p
            + gamma[:, None] * jnp.einsum("bij,bj->bi", YY, p)
            - gamma[:, None] * Yg
        )
        u = jnp.linalg.solve(jnp.swapaxes(R, 1, 2), w[..., None])[..., 0]
        r_vec = (
            _col(gamma) * g
            + _bhist_combine(u, s_hist)
            - _col(gamma) * _bhist_combine(p, y_hist)
        )

        new_state = state._replace(
            s_hist=s_hist, y_hist=y_hist, rho=rho, gamma=gamma
        )
        return -lr * r_vec, new_state

    step_vec, state = jax.lax.cond(
        state.step == 0, first_step, later_step, state
    )
    state = state._replace(
        step=state.step + 1, prev_grad=g, prev_step_vec=step_vec
    )
    return step_vec, state
