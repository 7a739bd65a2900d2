"""Batched L-BFGS formulation ablation: update_batch vs vmap(update).

The batched video/MIP path (parallel/batched.py) runs one L-BFGS update
per frame each step. Three formulations of "B independent L-BFGS lanes":

* ``vmap(lbfgs.update)`` — the round-2 implementation. vmap lifts the
  per-lane ``step == 0`` lax.cond into a batched ``select`` (both
  branches execute every iteration, and the cond fusion fence the
  single-frame loop relies on dissolves), and per-lane history slots
  make the circular-buffer row write a scatter.
* ``lbfgs.update_batch`` — batch-first state with a SHARED scalar
  step/slot (lanes advance in lockstep inside the fori_loop anyway), so
  the cond and the dynamic-slice row write survive batching.
A third probe (round-3h) statically removed update_batch's lax.cond
(later-step body every step): it lost at EVERY batch size — 34.1 ms at
B=1 512px, 4.50 ms/frame at B=8 256px — proving the fence, not the
branch structure, is what keeps the compact block on the MXU at small
B. It needed a temporary static `is_first` branch, so it is not
re-runnable from this script; numbers in PROFILE.md round-3h.

Production (``batched._lbfgs_init/_lbfgs_update``) selects update_batch
for B <= _BATCH_FIRST_MAX_B and vmap(update) above — this script
measures both at any B by patching those selection helpers.

Full-loop measurement through the production ``batched.run`` program
(init + fori_loop of train steps), scalar fetch only. Usage:
python benchmarks/exp_lbfgs_batch.py [--size 512] [--steps 120]
    [--batches 1 2 4 8]
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


def _batch_first_init(b, shape, memory_size):
    return lbfgs.init_batch_state(b, shape, memory_size)


def _batch_first_update(grads, state, lr):
    return lbfgs.update_batch(grads, state, lr=lr)


def _vmap_init(b, shape, memory_size):
    return jax.vmap(lambda _: lbfgs.init_state(shape, memory_size))(
        jnp.arange(b)
    )


def _vmap_update(grads, state, lr):
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

    orig = (batched._lbfgs_init, batched._lbfgs_update)
    variants = [
        ("update_batch (shared slot)", (_batch_first_init, _batch_first_update)),
        ("vmap(update) (r2 path)", (_vmap_init, _vmap_update)),
    ]
    for b in args.batches:
        frames = jnp.asarray(
            rng.random((b, args.size, args.size, 3)), jnp.float32
        )
        for name, (init_fn, upd_fn) in variants:
            batched._lbfgs_init, batched._lbfgs_update = init_fn, upd_fn
            jax.clear_caches()
            try:
                ms = time_run(cfg, params, frames, style, args.steps) * 1e3
                print(
                    f"B={b} {name:28s} {ms:7.2f} ms/step"
                    f"  ({ms / b:6.2f} ms/frame)",
                    flush=True,
                )
            except Exception as e:  # remote-compile hiccups shouldn't
                print(f"B={b} {name:28s} FAILED: {e}", flush=True)  # kill the sweep
            finally:
                batched._lbfgs_init, batched._lbfgs_update = orig


if __name__ == "__main__":
    main()
