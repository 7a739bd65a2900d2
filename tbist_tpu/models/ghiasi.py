"""Ghiasi arbitrary-style image transformer (functional, NHWC).

Architecture parity with the reference (text/subnetworks/
ghiasi_img_transformer.py:15-27, after Ghiasi et al. 2017):

* encoder: ConvInRelu 3→32 k9 s1, 32→64 k3 s2, 64→128 k3 s2
  (reflection pad, instance norm, ReLU; *no* style conditioning,
  :49-53)
* 5 style-conditioned residual blocks (128 ch, two convs each with
  instance norm + FiLM γ/β from Linear(100, C), :161-220)
* decoder: UpsampleConvInRelu 128→64 ×2, 64→32 ×2, 32→3 k9 no-upsample
  no-activation; each applies FiLM after instance norm (:97-158)
* final sigmoid (:55)

TPU-first notes: NHWC + HWIO; instance norm reductions and the FiLM
affine are fused by XLA into the surrounding convs; nearest upsample is a
reshape-broadcast (no gather). The style vector is (B, 100).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Dict[str, jnp.ndarray]]

# (kind, name, cin, cout, kernel, stride_or_upsample)
LAYERS: Tuple = (
    ("conv", "enc1", 3, 32, 9, 1),
    ("conv", "enc2", 32, 64, 3, 2),
    ("conv", "enc3", 64, 128, 3, 2),
    ("res", "res1", 128, 128, 3, 1),
    ("res", "res2", 128, 128, 3, 1),
    ("res", "res3", 128, 128, 3, 1),
    ("res", "res4", 128, 128, 3, 1),
    ("res", "res5", 128, 128, 3, 1),
    ("up", "dec1", 128, 64, 3, 2),
    ("up", "dec2", 64, 32, 3, 2),
    ("up", "dec3", 32, 3, 9, None),  # no upsample, no activation
)

STYLE_DIM = 100


def _conv_init(key, cin, cout, k, dtype):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(cin * k * k)
    return {
        "kernel": jax.random.uniform(k1, (k, k, cin, cout), dtype, -bound, bound),
        "bias": jax.random.uniform(k2, (cout,), dtype, -bound, bound),
    }


def _linear_init(key, cin, cout, dtype):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(cin)
    return {
        "kernel": jax.random.uniform(k1, (cin, cout), dtype, -bound, bound),
        "bias": jax.random.uniform(k2, (cout,), dtype, -bound, bound),
    }


def _init_params_impl(key: jax.Array, dtype=jnp.float32) -> Params:
    params: Params = {}
    for kind, name, cin, cout, k, _ in LAYERS:
        key, sub = jax.random.split(key)
        if kind == "conv":
            params[name] = _conv_init(sub, cin, cout, k, dtype)
        elif kind == "up":
            s1, s2, s3 = jax.random.split(sub, 3)
            params[name] = _conv_init(s1, cin, cout, k, dtype)
            params[name]["fc_gamma"] = _linear_init(s2, STYLE_DIM, cout, dtype)
            params[name]["fc_beta"] = _linear_init(s3, STYLE_DIM, cout, dtype)
        else:  # residual block: two convs + two FiLM pairs
            ks = jax.random.split(sub, 6)
            params[name] = {
                "conv1": _conv_init(ks[0], cin, cout, k, dtype),
                "conv2": _conv_init(ks[1], cout, cout, k, dtype),
                "fc_gamma1": _linear_init(ks[2], STYLE_DIM, cout, dtype),
                "fc_beta1": _linear_init(ks[3], STYLE_DIM, cout, dtype),
                "fc_gamma2": _linear_init(ks[4], STYLE_DIM, cout, dtype),
                "fc_beta2": _linear_init(ks[5], STYLE_DIM, cout, dtype),
            }
    return params


def _reflect_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def _conv(x, p, stride: int, compute_dtype):
    """Conv + bias in ``compute_dtype``. Activations FLOW in that dtype —
    the path is HBM-bound at ~2% MFU (the MXU already runs fast-bf16 on
    f32 inputs), so a bf16 activation stream halves the traffic of every
    layer; for f32 this is the original program bit-for-bit."""
    out = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        p["kernel"].astype(compute_dtype),
        (stride, stride),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["bias"].astype(compute_dtype)


def _instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-(batch, channel) spatial normalization, no affine (torch
    default). Statistics accumulate in f32 regardless of the activation
    dtype (bf16 mean/var over 512^2 pixels would lose ~2 decimal
    digits); the normalized result stays in x's dtype."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    var = jnp.mean(
        jnp.square(x.astype(jnp.float32) - mean), axis=(1, 2), keepdims=True
    )
    scale = jax.lax.rsqrt(var + eps)
    return (x - mean.astype(x.dtype)) * scale.astype(x.dtype)


def _film(x, p_gamma, p_beta, style):
    # the (B, 100) @ (100, C) affine is tiny — keep it f32, cast at use
    gamma = style @ p_gamma["kernel"] + p_gamma["bias"]  # (B, C)
    beta = style @ p_beta["kernel"] + p_beta["bias"]
    return (
        gamma[:, None, None, :].astype(x.dtype) * x
        + beta[:, None, None, :].astype(x.dtype)
    )


def _upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def apply(
    params: Params,
    x: jnp.ndarray,
    style: jnp.ndarray,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """x: (B, H, W, 3) in [0,1]; style: (B, 100). Returns sigmoid output."""
    for kind, name, _, _, k, stride in LAYERS:
        p = params[name]
        pad = k // 2
        if kind == "conv":
            h = _conv(_reflect_pad(x, pad), p, stride, compute_dtype)
            x = jax.nn.relu(_instance_norm(h))
        elif kind == "res":
            y = _conv(_reflect_pad(x, 1), p["conv1"], 1, compute_dtype)
            y = _film(_instance_norm(y), p["fc_gamma1"], p["fc_beta1"], style)
            y = jax.nn.relu(y)
            y = _conv(_reflect_pad(y, 1), p["conv2"], 1, compute_dtype)
            y = _film(_instance_norm(y), p["fc_gamma2"], p["fc_beta2"], style)
            x = x + y
        else:  # up
            h = x if stride is None else _upsample_nearest_2x(x)
            h = _conv(_reflect_pad(h, pad), p, 1, compute_dtype)
            h = _film(_instance_norm(h), p["fc_gamma"], p["fc_beta"], style)
            x = jax.nn.relu(h) if name != "dec3" else h
    # f32 output regardless of the activation stream (no-op for f32)
    return jax.nn.sigmoid(x.astype(jnp.float32))


def init_params(*args, **kwargs):
    """Seeded init; always float32 (x64 test mode would otherwise produce
    float64 from jnp.zeros/jax.random defaults)."""
    import jax

    return jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "dtype") and a.dtype.kind == "f"
        else a,
        _init_params_impl(*args, **kwargs),
    )
