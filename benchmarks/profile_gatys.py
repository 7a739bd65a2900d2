"""Decompose the 512px Gatys iteration cost on the real TPU (VERDICT r1 #2).

Runs the full jitted loop under ablations (drop one loss term at a time,
swap optimizer, swap dtype, forward-only) and prints a per-component
breakdown by subtraction, plus an MFU estimate against the analytic VGG
FLOP count. Usage:  python benchmarks/profile_gatys.py [--size 512]
[--steps 120] [--trace DIR]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tbist_tpu.models import vgg19
from tbist_tpu.optimize import gatys
from tbist_tpu.utils.config import GatysConfig
from tbist_tpu.weights import vgg as vgg_weights


def _vgg_flops_per_image(h: int, w: int, layers) -> float:
    """Analytic fwd FLOPs of the VGG trunk up to the deepest layer."""
    deepest = max(vgg19.CONV_NAMES.index(l) for l in layers)
    flops = 0.0
    hh, ww = h, w
    idx = -1
    for spec in vgg19.VGG19_LAYERS:
        if len(spec) == 1:
            hh, ww = hh // 2, ww // 2
            continue
        idx += 1
        _, cin, cout = spec
        flops += 2.0 * hh * ww * cin * cout * 9
        if idx == deepest:
            break
    return flops


def time_loop(content, styles, cfg, params, steps: int) -> float:
    """Seconds per iteration of the full jitted loop (compile excluded)."""
    run_cfg = dataclasses.replace(cfg, num_steps=steps)
    # compile + warm
    out, _ = gatys.stylize(content, styles, run_cfg, params)
    np.asarray(out)  # axon: force fetch, block_until_ready can return early
    t0 = time.perf_counter()
    out, _ = gatys.stylize(content, styles, run_cfg, params)
    np.asarray(out)
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--trace", default=None, help="jax.profiler trace dir")
    ap.add_argument(
        "--only", default=None,
        help="comma-separated variant names to run (default: all) — large "
        "sizes compile each variant separately, so a 2048px trace run "
        "wants --only full_lbfgs_f32",
    )
    args = ap.parse_args()

    params = vgg_weights.get_params()
    key = jax.random.key(0)
    content = jax.random.uniform(key, (1, args.size, args.size, 3), jnp.float32)
    style = jax.random.uniform(
        jax.random.split(key)[0], (1, args.size, args.size, 3), jnp.float32
    )

    base = GatysConfig()
    variants = {
        "full_lbfgs_f32": base,
        "full_lbfgs_bf16": dataclasses.replace(base, dtype="bfloat16"),
        "full_adam_f32": dataclasses.replace(base, optimizer="adam"),
        "no_style": dataclasses.replace(base, w_style=0.0),
        "no_content": dataclasses.replace(base, w_content=0.0),
        "no_tv": dataclasses.replace(base, w_tv=0.0),
        "no_edge": dataclasses.replace(base, w_edge=0.0),
        "no_tv_no_edge": dataclasses.replace(base, w_tv=0.0, w_edge=0.0),
        "style_only": dataclasses.replace(
            base, w_content=0.0, w_tv=0.0, w_edge=0.0
        ),
        "content_only": dataclasses.replace(
            base, w_style=0.0, w_tv=0.0, w_edge=0.0
        ),
        "style_only_bf16": dataclasses.replace(
            base, w_content=0.0, w_tv=0.0, w_edge=0.0, dtype="bfloat16"
        ),
    }

    if args.only:
        keep = {s.strip() for s in args.only.split(",")}
        unknown = keep - set(variants)
        assert not unknown, f"unknown variants: {unknown}"
        variants = {k: v for k, v in variants.items() if k in keep}

    results = {}
    for name, cfg in variants.items():
        sec = time_loop(content, [style], cfg, params, args.steps)
        results[name] = sec
        print(f"{name:24s} {sec * 1e3:8.2f} ms/iter   {1.0 / sec:7.1f} it/s", flush=True)

    if args.trace:
        cfg = dataclasses.replace(base, num_steps=30)
        out, _ = gatys.stylize(content, [style], cfg, params)  # compile
        np.asarray(out)
        with jax.profiler.trace(args.trace):
            out, _ = gatys.stylize(content, [style], cfg, params)
            np.asarray(out)
        print(f"trace written to {args.trace}")

    # MFU estimate: style layers need the trunk through conv5_1 fwd; the
    # backward is ~2x fwd; content/tv/edge negligible FLOPs.
    fwd = _vgg_flops_per_image(args.size, args.size, base.style_layers)
    total = 3.0 * fwd  # fwd + ~2x bwd
    sec = results.get("full_lbfgs_f32")
    if sec is None:  # --only without the headline variant
        print(json.dumps({k: round(1.0 / v, 2) for k, v in results.items()}))
        return
    print(f"\nanalytic VGG flops/iter (fwd+bwd): {total / 1e9:.1f} GFLOP")
    print(f"achieved: {total / sec / 1e12:.1f} TFLOP/s")
    print(
        "v5e peak: 197 bf16 / ~99 f32(fp32 via MXU passes) TFLOP/s -> "
        f"MFU ~ {total / sec / 197e12 * 100:.1f}% (bf16 basis)"
    )
    print(json.dumps({k: round(1.0 / v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
