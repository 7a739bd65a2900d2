"""L-BFGS in pure JAX, semantics-compatible with ``torch.optim.LBFGS``.

The reference drives its 400-iteration pixel optimization with torch LBFGS
at defaults (run_style_transfer.py:90): **no line search**, lr=1, first
step scaled by ``min(1, 1/||g||_1)``, history of (s, y) pairs skipped when
curvature ``y·s <= 1e-10``. One iteration = one loss/grad evaluation, which
is what the iters/sec benchmark counts.

This implementation is a fixed-shape circular-buffer two-loop recursion,
fully jit-compatible (static memory size, masked history) so the whole
optimization runs inside a single ``lax.fori_loop`` on device. Per-step
cost beyond the user's grad is ~4·m·N VPU flops — negligible next to the
VGG forward/backward.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class LBFGSState(NamedTuple):
    step: jnp.ndarray  # int32 iteration counter
    s_hist: jnp.ndarray  # (m, N) parameter differences
    y_hist: jnp.ndarray  # (m, N) gradient differences
    rho: jnp.ndarray  # (m,) 1/(y·s); 0 marks an invalid slot
    prev_grad: jnp.ndarray  # (N,)
    prev_step_vec: jnp.ndarray  # (N,) t*d actually applied last iteration
    gamma: jnp.ndarray  # H0 scaling (y·s)/(y·y)


def init_state(n: int, memory_size: int, dtype=jnp.float32) -> LBFGSState:
    m = memory_size
    return LBFGSState(
        step=jnp.zeros((), jnp.int32),
        s_hist=jnp.zeros((m, n), dtype),
        y_hist=jnp.zeros((m, n), dtype),
        rho=jnp.zeros((m,), dtype),
        prev_grad=jnp.zeros((n,), dtype),
        prev_step_vec=jnp.zeros((n,), dtype),
        gamma=jnp.ones((), dtype),
    )


@functools.partial(jax.jit, donate_argnames=("state",))
def update(
    grad: jnp.ndarray, state: LBFGSState, lr: float = 1.0
) -> Tuple[jnp.ndarray, LBFGSState]:
    """One L-BFGS step. Returns (update_vector, new_state).

    ``update_vector`` is the additive parameter update (t * direction).
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
        ys = jnp.dot(y, s)
        valid = ys > 1e-10

        slot = (state.step - 1) % m
        s_hist = jnp.where(
            valid, state.s_hist.at[slot].set(s), state.s_hist
        )
        y_hist = jnp.where(
            valid, state.y_hist.at[slot].set(y), state.y_hist
        )
        rho = jnp.where(
            valid, state.rho.at[slot].set(1.0 / ys), state.rho
        )
        gamma = jnp.where(valid, ys / jnp.dot(y, y), state.gamma)

        # Two-loop recursion, newest -> oldest then oldest -> newest.
        # Slots are visited via index arithmetic on the circular buffer;
        # invalid slots (rho == 0) contribute nothing.
        q = g
        alphas = jnp.zeros((m,), g.dtype)

        def loop1(i, carry):
            q, alphas = carry
            idx = (slot - i) % m
            r = rho[idx]
            alpha = r * jnp.dot(s_hist[idx], q)
            q = jnp.where(r != 0.0, q - alpha * y_hist[idx], q)
            alphas = alphas.at[idx].set(alpha)
            return q, alphas

        q, alphas = jax.lax.fori_loop(0, m, loop1, (q, alphas))
        r_vec = gamma * q

        def loop2(i, r_vec):
            idx = (slot - (m - 1) + i) % m
            rr = rho[idx]
            beta = rr * jnp.dot(y_hist[idx], r_vec)
            return jnp.where(
                rr != 0.0, r_vec + (alphas[idx] - beta) * s_hist[idx], r_vec
            )

        r_vec = jax.lax.fori_loop(0, m, loop2, r_vec)
        new_state = state._replace(
            s_hist=s_hist, y_hist=y_hist, rho=rho, gamma=gamma
        )
        return -lr * r_vec, new_state

    step_vec, state = jax.lax.cond(state.step == 0, first_step, later_step, state)
    state = state._replace(
        step=state.step + 1, prev_grad=g, prev_step_vec=step_vec
    )
    return step_vec, state
