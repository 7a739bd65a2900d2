"""Round-2b layout experiments on the 512px Gatys loop (one variant per run).

Targets the ~2.7 ms/iter of layout/staging copies identified in
benchmarks/PROFILE.md. One variant per PROCESS (the jit cache would
otherwise hide a monkeypatch). Usage:

    python benchmarks/exp_layout.py --variant baseline|relu_save|nchw|nchw_relu
                                    [--size 512] [--steps 120]

Variants:
  baseline   current production code path.
  relu_save  custom-VJP ReLU that saves its OUTPUT for the backward, so the
             conv->relu pair needs only one materialized buffer (XLA keeps
             the pre-activation alive for jnp.maximum's VJP otherwise).
  nchw       VGG trunk in NCHW: W=512 sits in the 128-lane dimension
             (aligned), instead of C=64 (half-empty lanes at conv1/2).
             Captured features transposed back to NHWC for the loss.
  nchw_relu  both.
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
from tbist_tpu.utils.config import GatysConfig


@jax.custom_vjp
def relu_save_out(x):
    return jnp.maximum(x, 0)


def _relu_fwd(x):
    y = jnp.maximum(x, 0)
    return y, y


def _relu_bwd(y, g):
    return (jnp.where(y > 0, g, jnp.zeros_like(g)),)


relu_save_out.defvjp(_relu_fwd, _relu_bwd)


def make_extract_nchw(relu_fn):
    def extract_features_nchw(params, x, layers, compute_dtype=jnp.float32):
        wanted = set(layers)
        deepest = max(vgg19.CONV_NAMES.index(l) for l in layers)
        x = jnp.transpose(x, (0, 3, 1, 2)).astype(compute_dtype)
        feats = {}
        conv_idx = -1
        for spec in vgg19.VGG19_LAYERS:
            if len(spec) == 1:
                b, c, h, w = x.shape
                x = x[:, :, : h - h % 2, : w - w % 2]
                x = x.reshape(b, c, h // 2, 2, w // 2, 2)
                x = jnp.max(x, axis=(3, 5))
                continue
            name = spec[0]
            conv_idx += 1
            p = params[name]
            pre = jax.lax.conv_general_dilated(
                x,
                p["kernel"].astype(compute_dtype),
                window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NCHW", "HWIO", "NCHW"),
            ) + p["bias"].astype(compute_dtype).reshape(1, -1, 1, 1)
            if name in wanted:
                feats[name] = jnp.transpose(pre, (0, 2, 3, 1))
            x = relu_fn(pre)
            if conv_idx == deepest:
                break
        return feats

    return extract_features_nchw


def make_extract_nhwc(relu_fn):
    def extract_features(params, x, layers, compute_dtype=jnp.float32):
        wanted = set(layers)
        deepest = max(vgg19.CONV_NAMES.index(l) for l in layers)
        feats = {}
        conv_idx = -1
        for spec in vgg19.VGG19_LAYERS:
            if len(spec) == 1:
                x = vgg19._max_pool_2x2(x)
                continue
            name = spec[0]
            conv_idx += 1
            pre = vgg19._conv(x, params[name], compute_dtype)
            if name in wanted:
                feats[name] = pre
            x = relu_fn(pre)
            if conv_idx == deepest:
                break
        return feats

    return extract_features


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", required=True)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=120)
    args = ap.parse_args()

    if args.variant == "relu_save":
        vgg19.extract_features = make_extract_nhwc(relu_save_out)
    elif args.variant == "nchw":
        vgg19.extract_features = make_extract_nchw(jax.nn.relu)
    elif args.variant == "nchw_relu":
        vgg19.extract_features = make_extract_nchw(relu_save_out)
    elif args.variant != "baseline":
        raise SystemExit(f"unknown variant {args.variant}")

    from tbist_tpu.optimize import gatys  # import AFTER the patch

    params = vgg19.init_params(jax.random.key(0))
    key = jax.random.key(0)
    content = jax.random.uniform(key, (1, args.size, args.size, 3), jnp.float32)
    style = jax.random.uniform(
        jax.random.split(key)[0], (1, args.size, args.size, 3), jnp.float32
    )

    cfg = dataclasses.replace(GatysConfig(), num_steps=args.steps)
    out, _ = gatys.stylize(content, [style], cfg, params)
    ref = np.asarray(out)  # compile + fetch
    t0 = time.perf_counter()
    out, _ = gatys.stylize(content, [style], cfg, params)
    np.asarray(out)
    sec = (time.perf_counter() - t0) / args.steps
    print(
        f"{args.variant:12s} size={args.size} {sec * 1e3:8.3f} ms/iter "
        f"{1.0 / sec:7.1f} it/s  mean={float(ref.mean()):.6f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
