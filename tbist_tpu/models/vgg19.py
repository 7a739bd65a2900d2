"""VGG-19 feature extractor (functional, NHWC, TPU-first).

Capability parity with the reference ``Vgg19`` wrapper
(multi_style_transfer/helper_functions.py:44-101), including its exact
feature semantics: the captured activation for ``convX_Y`` is the conv
output *before* its ReLU (the reference's slice ends at the conv layer),
and computation stops after the deepest requested layer.

Design differences (TPU-first, not a port):

* NHWC layout, HWIO kernels — natural for the TPU conv units.
* Plain param pytree ``{layer: {"kernel", "bias"}}`` + pure ``extract_features``
  function: trivially jit/vmap/pjit-able and shardable with NamedSharding.
* Optional bfloat16 conv compute with fp32 accumulation
  (``preferred_element_type``) — MXU-friendly.

Weights come from ``tbist_tpu.weights.vgg`` (torchvision ``.pth`` converter
with a deterministic seeded He-init fallback when no checkpoint exists in
the environment).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

# (layer_name, in_channels, out_channels); "pool" entries are 2x2/2 maxpools.
# Mirrors torchvision vgg19().features ordering.
VGG19_LAYERS: Tuple = (
    ("conv1_1", 3, 64),
    ("conv1_2", 64, 64),
    ("pool1",),
    ("conv2_1", 64, 128),
    ("conv2_2", 128, 128),
    ("pool2",),
    ("conv3_1", 128, 256),
    ("conv3_2", 256, 256),
    ("conv3_3", 256, 256),
    ("conv3_4", 256, 256),
    ("pool3",),
    ("conv4_1", 256, 512),
    ("conv4_2", 512, 512),
    ("conv4_3", 512, 512),
    ("conv4_4", 512, 512),
    ("pool4",),
    ("conv5_1", 512, 512),
    ("conv5_2", 512, 512),
    ("conv5_3", 512, 512),
    ("conv5_4", 512, 512),
)

CONV_NAMES: Tuple[str, ...] = tuple(
    spec[0] for spec in VGG19_LAYERS if spec[0].startswith("conv")
)

Params = Dict[str, Dict[str, jnp.ndarray]]


def _init_params_impl(key: jax.Array, dtype=jnp.float32) -> Params:
    """Deterministic He-initialized parameters (used when no checkpoint)."""
    params: Params = {}
    for spec in VGG19_LAYERS:
        if len(spec) == 1:
            continue
        name, cin, cout = spec
        key, k1 = jax.random.split(key)
        fan_in = 3 * 3 * cin
        w = jax.random.normal(k1, (3, 3, cin, cout), dtype) * jnp.sqrt(2.0 / fan_in)
        params[name] = {"kernel": w, "bias": jnp.zeros((cout,), dtype)}
    return params


import os

_USE_PALLAS_POOL = os.environ.get("TBIST_PALLAS_POOL", "0") == "1"
# "1": fused relu+pool Pallas backward at pool1 only; "2": at every pool.
# Experimental (r2 VERDICT #4): makes the custom-call fence swallow the
# relu backward + its layout transposes along with the pool backward.
_RELU_POOL_MODE = os.environ.get("TBIST_PALLAS_RELU_POOL", "0")


def _max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    # reshape-max instead of reduce_window: identical for even H/W (the
    # shape-bucketing policy guarantees multiples of 32), torch MaxPool2d
    # also floor-drops odd remainders, and its AUTOMATIC backward measured
    # fastest on v5e of three XLA formulations profiled in round 2 (see
    # benchmarks/PROFILE.md): reshape-max 11.1 ms/iter full-loop vs
    # reduce_window+select_and_scatter 11.9 vs a hand VJP built from
    # stride-2 slices 12.9 (W-stride-2 is lane-hostile on TPU). Tie
    # gradients split evenly among maxima (jax reduce_max semantics).
    # TBIST_PALLAS_POOL=1 swaps in the fused Pallas backward
    # (ops.pallas_pool) on supported TPU shapes — same forward, same
    # tie-splitting VJP.
    b, h, w, c = x.shape
    x = x[:, : h - h % 2, : w - w % 2, :]
    if _USE_PALLAS_POOL:
        from tbist_tpu.ops import pallas_pool

        if pallas_pool.supported(x):
            return pallas_pool.max_pool_2x2_even(x)
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.max(x, axis=(2, 4))


def _conv(x: jnp.ndarray, p: Dict[str, jnp.ndarray], compute_dtype) -> jnp.ndarray:
    # The whole trunk stays in compute_dtype: bf16 activations halve HBM
    # traffic through the memory-bound early layers (+16% full-loop
    # iters/s measured on v5e); the MXU accumulates in fp32 internally
    # either way, and the loss math upcasts captured features to fp32.
    kernel = p["kernel"].astype(compute_dtype)
    out = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        kernel,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["bias"].astype(compute_dtype)


def extract_features(
    params: Params,
    x: jnp.ndarray,
    layers: Sequence[str],
    compute_dtype=jnp.float32,
) -> Dict[str, jnp.ndarray]:
    """Run VGG-19 up to the deepest requested conv layer.

    ``x`` is a *normalized* NHWC image batch. Returns
    ``{layer: pre-ReLU conv activation (B, H', W', C')}`` in compute_dtype
    (loss functions upcast to fp32 where normalization demands it).
    """
    wanted = set(layers)
    unknown = wanted - set(CONV_NAMES)
    if unknown:
        raise ValueError(f"Unknown VGG-19 layers: {sorted(unknown)}")
    deepest = max(CONV_NAMES.index(l) for l in layers)

    feats: Dict[str, jnp.ndarray] = {}
    conv_idx = -1
    pool_idx = 0
    last_pre = None
    for spec in VGG19_LAYERS:
        if len(spec) == 1:  # pool
            fuse = _RELU_POOL_MODE == "2" or (
                _RELU_POOL_MODE == "1" and pool_idx == 0
            )
            if fuse and last_pre is not None:
                from tbist_tpu.ops import pallas_relu_pool

                if pallas_relu_pool.supported(last_pre):
                    # the separate x = relu(last_pre) above is dead code
                    # on this path and DCE'd by XLA
                    x = pallas_relu_pool.relu_max_pool_2x2_even(last_pre)
                else:
                    x = _max_pool_2x2(x)
            else:
                x = _max_pool_2x2(x)
            pool_idx += 1
            continue
        name = spec[0]
        conv_idx += 1
        pre = _conv(x, params[name], compute_dtype)
        if name in wanted:
            feats[name] = pre
        x = jax.nn.relu(pre)
        last_pre = pre
        if conv_idx == deepest:
            break
    return feats


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
