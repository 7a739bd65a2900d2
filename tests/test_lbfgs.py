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
