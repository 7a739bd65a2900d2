"""Batched L-BFGS formulation ablation: update_batch vs vmap(update).

The batched video/MIP path (parallel/batched.py) runs one L-BFGS update
per frame each step. Two formulations of "B independent L-BFGS lanes":

* ``vmap(lbfgs.update)`` — the round-2 implementation. vmap lifts the
  per-lane ``step == 0`` lax.cond into a batched ``select`` (both
  branches execute every iteration, and the cond fusion fence the
  single-frame loop relies on dissolves), and per-lane history slots
  make the circular-buffer row write a scatter.
* ``lbfgs.update_batch`` — batch-first state with a SHARED scalar
  step/slot (lanes advance in lockstep inside the fori_loop anyway), so
  the cond and the dynamic-slice row write survive batching.

Full-loop measurement through the production ``batched.run`` program
(init + fori_loop of train steps), scalar fetch only. Usage:
python benchmarks/exp_lbfgs_batch.py [--size 512] [--steps 120]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tbist_tpu.optimize import lbfgs
from tbist_tpu.parallel import batched
from tbist_tpu.utils.config import GatysConfig
from tbist_tpu.weights import vgg as vgg_weights


def _vmap_init(batch, shape, memory_size, dtype=jnp.float32):
    return jax.vmap(lambda _: lbfgs.init_state(shape, memory_size, dtype))(
        jnp.arange(batch)
    )


def _vmap_update(grads, state, lr=1.0):
    return jax.vmap(lambda g, s: lbfgs.update(g, s, lr=lr))(grads, state)


def time_run(cfg, params, frames, style, steps: int) -> float:
    run_cfg = dataclasses.replace(cfg, num_steps=steps)
    out = batched.run(run_cfg, params, frames, (style,))
    float(out[0, 0, 0, 0])  # scalar fetch: axon's 31 MB/s link stays out
    t0 = time.perf_counter()
    out = batched.run(run_cfg, params, frames, (style,))
    float(out[0, 0, 0, 0])
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 4])
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    style = jnp.asarray(rng.random((1, args.size, args.size, 3)), jnp.float32)
    params = vgg_weights.get_params()
    cfg = GatysConfig(optimizer="lbfgs")

    orig = (lbfgs.init_batch_state, lbfgs.update_batch)
    variants = [
        ("update_batch (shared slot)", orig),
        ("vmap(update) (r2 path)", (_vmap_init, _vmap_update)),
    ]
    for b in args.batches:
        frames = jnp.asarray(
            rng.random((b, args.size, args.size, 3)), jnp.float32
        )
        for name, (init_fn, upd_fn) in variants:
            lbfgs.init_batch_state, lbfgs.update_batch = init_fn, upd_fn
            jax.clear_caches()
            try:
                ms = time_run(cfg, params, frames, style, args.steps) * 1e3
                print(
                    f"B={b} {name:28s} {ms:7.2f} ms/step"
                    f"  ({ms / b:6.2f} ms/frame)",
                    flush=True,
                )
            finally:
                lbfgs.init_batch_state, lbfgs.update_batch = orig


if __name__ == "__main__":
    main()
