"""optimization_barrier placement ablation for the 512px Gatys loop.

Motivated by the L-BFGS ``lax.cond`` finding (benchmarks/PROFILE.md): a
scheduling/fusion fence around the update *halved* the loop, so XLA's
global fusion decisions for this program are demonstrably suboptimal in
places. This measures whether explicit ``lax.optimization_barrier`` fences
at other joints (VGG activations, gram outputs, the normalize) help or
hurt. Full-loop measurement only. Usage:
python benchmarks/exp_barrier.py [--size 512] [--steps 120]
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

from tbist_tpu.models import vgg19
from tbist_tpu.ops import losses
from tbist_tpu.optimize import gatys
from tbist_tpu.utils.config import GatysConfig
from tbist_tpu.weights import vgg as vgg_weights


def time_loop(content, styles, cfg, params, steps: int) -> float:
    run_cfg = dataclasses.replace(cfg, num_steps=steps)
    out, _ = gatys.stylize(content, styles, run_cfg, params)
    np.asarray(out)  # axon: force fetch
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

    orig_extract = vgg19.extract_features
    orig_gram = losses.gram_matrix

    def extract_fenced(p, x, layers, dtype):
        feats = orig_extract(p, x, layers, dtype)
        return {k: jax.lax.optimization_barrier(v) for k, v in feats.items()}

    def gram_fenced(x, *a, **kw):
        return jax.lax.optimization_barrier(orig_gram(x, *a, **kw))

    variants = [
        ("baseline", {}),
        ("fence each VGG activation", {"extract": extract_fenced}),
        ("fence each gram output", {"gram": gram_fenced}),
    ]
    for name, patch in variants:
        vgg19.extract_features = patch.get("extract", orig_extract)
        losses.gram_matrix = patch.get("gram", orig_gram)
        # gatys closed over losses/vgg19 module attrs at call time, so a
        # cache clear + re-trace picks the patches up
        jax.clear_caches()
        try:
            ms = time_loop(content, (style,), cfg, params, args.steps) * 1e3
            print(f"{name:30s} {ms:7.2f} ms/iter", flush=True)
        finally:
            vgg19.extract_features = orig_extract
            losses.gram_matrix = orig_gram


if __name__ == "__main__":
    main()
