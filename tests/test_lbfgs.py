"""L-BFGS parity vs torch.optim.LBFGS (the reference optimizer)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from tbist_tpu.optimize import lbfgs


def _quad_np(A, b):
    def f(x):
        return 0.5 * x @ A @ x - b @ x

    return f


class TestLBFGSParity:
    def test_matches_torch_on_quadratic(self):
        rng = np.random.default_rng(3)
        n = 8
        M = rng.standard_normal((n, n))
        A = (M @ M.T + n * np.eye(n)).astype(np.float64)
        b = rng.standard_normal(n).astype(np.float64)
        x0 = rng.standard_normal(n).astype(np.float64)

        # torch trajectory: max_iter=1 => one inner iteration per .step()
        xt = torch.tensor(x0, requires_grad=True)
        At, bt = torch.tensor(A), torch.tensor(b)
        opt = torch.optim.LBFGS([xt], lr=1.0, max_iter=1, history_size=10,
                                tolerance_grad=0, tolerance_change=0)
        torch_traj = []
        for _ in range(12):
            def closure():
                opt.zero_grad()
                loss = 0.5 * xt @ At @ xt - bt @ xt
                loss.backward()
                return loss
            opt.step(closure)
            torch_traj.append(xt.detach().numpy().copy())

        # ours
        Aj, bj = jnp.asarray(A), jnp.asarray(b)
        grad_fn = jax.grad(lambda x: 0.5 * x @ Aj @ x - bj @ x)
        x = jnp.asarray(x0)
        state = lbfgs.init_state(n, memory_size=10, dtype=jnp.float64)
        ours_traj = []
        for _ in range(12):
            g = grad_fn(x)
            step_vec, state = lbfgs.update(g, state, lr=1.0)
            x = x + step_vec
            ours_traj.append(np.asarray(x))

        for i, (a, c) in enumerate(zip(torch_traj, ours_traj)):
            np.testing.assert_allclose(a, c, rtol=1e-6, atol=1e-8, err_msg=f"step {i}")

    def test_converges_on_rosenbrock(self):
        def rosen(x):
            return jnp.sum(
                100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2
            )

        grad_fn = jax.grad(rosen)
        x = jnp.zeros(4, jnp.float32)
        state = lbfgs.init_state(4, memory_size=10, dtype=jnp.float32)
        for _ in range(200):
            g = grad_fn(x)
            step_vec, state = lbfgs.update(g, state, lr=0.5)
            x = x + step_vec
        assert float(rosen(x)) < 1e-3


class TestUpdateBatch:
    def test_matches_vmapped_update(self):
        """update_batch (shared scalar step/slot, MXU-matmul grams) must
        trace the exact same per-lane trajectories as vmap(update) — it
        exists purely because vmapping the per-lane state costs ~5x on
        TPU at small B (lbfgs.update_batch docstring)."""
        rng = np.random.default_rng(7)
        b, shape, m = 3, (4, 5, 3), 5
        # a per-lane quadratic in the flattened pixels
        n = int(np.prod(shape))
        Ms = rng.standard_normal((b, n, n))
        As = jnp.asarray(
            np.einsum("bij,bkj->bik", Ms, Ms) + n * np.eye(n), jnp.float64
        )
        bs = jnp.asarray(rng.standard_normal((b, n)), jnp.float64)

        def grad_lane(x, A, c):
            return (A @ x.reshape(-1) - c).reshape(shape)

        x_ref = jnp.asarray(rng.standard_normal((b, *shape)), jnp.float64)
        x_bat = x_ref

        ref_states = jax.vmap(
            lambda _: lbfgs.init_state(shape, m, dtype=jnp.float64)
        )(jnp.arange(b))
        bat_state = lbfgs.init_batch_state(b, shape, m, dtype=jnp.float64)

        for step in range(9):
            g_ref = jax.vmap(grad_lane)(x_ref, As, bs)
            vec_ref, ref_states = jax.vmap(
                lambda g, s: lbfgs.update(g, s, lr=0.8)
            )(g_ref, ref_states)
            x_ref = x_ref + vec_ref

            g_bat = jax.vmap(grad_lane)(x_bat, As, bs)
            vec_bat, bat_state = lbfgs.update_batch(g_bat, bat_state, lr=0.8)
            x_bat = x_bat + vec_bat

            np.testing.assert_allclose(
                np.asarray(x_bat), np.asarray(x_ref),
                rtol=1e-9, atol=1e-12, err_msg=f"step {step}",
            )

    def test_invalid_curvature_lane_skips_history(self):
        """A lane whose y.s <= 1e-10 must keep its old history row while
        other lanes update theirs (the per-lane `valid` masking)."""
        b, shape, m = 2, (6,), 4
        state = lbfgs.init_batch_state(b, shape, m, dtype=jnp.float64)
        g0 = jnp.asarray(
            np.stack([np.ones(6), np.ones(6)]), jnp.float64
        )
        _, state = lbfgs.update_batch(g0, state, lr=1.0)
        # lane 0: same gradient again -> y = 0 -> invalid curvature
        # lane 1: shrunk gradient -> y.s = (g1-g0).(-t*g0) > 0, valid
        g1 = jnp.asarray(
            np.stack([np.ones(6), 0.5 * np.ones(6)]), jnp.float64
        )
        _, state = lbfgs.update_batch(g1, state, lr=1.0)
        rho = np.asarray(state.rho)
        assert rho[0].max() == 0.0  # lane 0 never stored a pair
        assert rho[1].max() > 0.0  # lane 1 did
