"""Remat ablation for the 512px Gatys loop (round-2 perf follow-up).

Hypothesis to test: ``jax.checkpoint`` around the loss forward changes the
HBM traffic pattern of the backward pass (recompute activations instead of
storing/reloading ~0.65 GB per iteration). On TPU, remat normally trades
FLOPs for memory *capacity*; this measures whether it also helps (or hurts)
the latency of a traffic-bound loop where MXU has slack.

Monkeypatches gatys._make_loss_fn to wrap loss_fn with jax.checkpoint and
clears jit caches between variants so each one retraces. Full-loop
measurement only (see benchmarks/PROFILE.md for why microbenchmarks lie
here). Usage: python benchmarks/exp_remat.py [--size 512] [--steps 120]
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

from tbist_tpu.optimize import gatys
from tbist_tpu.utils.config import GatysConfig
from tbist_tpu.weights import vgg as vgg_weights


def time_loop(content, styles, cfg, params, steps: int) -> float:
    run_cfg = dataclasses.replace(cfg, num_steps=steps)
    out, _ = gatys.stylize(content, styles, run_cfg, params)
    np.asarray(out)  # axon: force fetch; block_until_ready can return early
    t0 = time.perf_counter()
    out, _ = gatys.stylize(content, styles, run_cfg, params)
    np.asarray(out)
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=120)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    content = jnp.asarray(rng.random((1, args.size, args.size, 3)), jnp.float32)
    style = jnp.asarray(rng.random((1, args.size, args.size, 3)), jnp.float32)
    params = vgg_weights.get_params()
    cfg = GatysConfig(optimizer="lbfgs")

    orig = gatys._make_loss_fn

    def remat_factory(policy):
        def make(*a, **kw):
            return jax.checkpoint(orig(*a, **kw), policy=policy)

        return make

    variants = [
        ("baseline (no remat)", orig),
        ("full remat (nothing_saveable)",
         remat_factory(jax.checkpoint_policies.nothing_saveable)),
        ("remat, save dots only",
         remat_factory(jax.checkpoint_policies.dots_saveable)),
    ]
    for name, factory in variants:
        gatys._make_loss_fn = factory
        jax.clear_caches()
        try:
            ms = time_loop(content, styles=(style,), cfg=cfg, params=params,
                           steps=args.steps) * 1e3
            print(f"{name:34s} {ms:7.2f} ms/iter", flush=True)
        finally:
            gatys._make_loss_fn = orig


if __name__ == "__main__":
    main()
