"""VGG-19 weight loading: torchvision ``.pth`` converter + seeded fallback.

The reference pulls ImageNet weights from torchvision at runtime
(helper_functions.py:47). This environment has no torchvision and no
network egress, so the loader resolves, in order:

1. ``TBIST_VGG19_PTH`` env var or ``<repo>/weights_cache/vgg19.pth`` —
   a torch state dict (torchvision ``vgg19().features`` naming or full
   model naming), converted OIHW→HWIO once and cached as ``.npz``.
2. ``<repo>/weights_cache/vgg19.npz`` — the converted cache.
3. Deterministic He-init with a fixed seed — architecture-identical, so
   compute benchmarks are unaffected; stylization quality obviously needs
   real weights. A warning is logged.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tbist_tpu.models import vgg19
from tbist_tpu.utils.logging import logger

# torchvision vgg19().features indices of the 16 convs, in order
_TORCH_FEATURE_IDX = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "weights_cache")


def convert_torch_state_dict(state_dict) -> Dict[str, Dict[str, np.ndarray]]:
    """torch (OIHW) state dict -> NHWC/HWIO param pytree."""
    params: Dict[str, Dict[str, np.ndarray]] = {}
    for conv_name, idx in zip(vgg19.CONV_NAMES, _TORCH_FEATURE_IDX):
        for prefix in (f"features.{idx}", f"{idx}"):
            wkey, bkey = f"{prefix}.weight", f"{prefix}.bias"
            if wkey in state_dict:
                w = np.asarray(state_dict[wkey], dtype=np.float32)
                b = np.asarray(state_dict[bkey], dtype=np.float32)
                params[conv_name] = {
                    "kernel": np.transpose(w, (2, 3, 1, 0)),  # OIHW -> HWIO
                    "bias": b,
                }
                break
        else:
            raise KeyError(f"conv weights for {conv_name} not in state dict")
    return params


def _npz_path() -> str:
    return os.path.join(_CACHE_DIR, "vgg19.npz")


def _load_npz(path: str) -> Optional[vgg19.Params]:
    if not os.path.exists(path):
        return None
    data = np.load(path)
    params = {}
    for conv_name in vgg19.CONV_NAMES:
        params[conv_name] = {
            "kernel": jnp.asarray(data[f"{conv_name}.kernel"]),
            "bias": jnp.asarray(data[f"{conv_name}.bias"]),
        }
    return params


def _try_torch_pth() -> Optional[vgg19.Params]:
    candidates = [
        os.environ.get("TBIST_VGG19_PTH", ""),
        os.path.join(_CACHE_DIR, "vgg19.pth"),
    ]
    for path in candidates:
        if path and os.path.exists(path):
            import torch  # local import: torch is host-side only

            sd = torch.load(path, map_location="cpu", weights_only=True)
            if hasattr(sd, "state_dict"):
                sd = sd.state_dict()
            np_params = convert_torch_state_dict(
                {k: v.numpy() for k, v in sd.items()}
            )
            os.makedirs(_CACHE_DIR, exist_ok=True)
            flat = {}
            for name, p in np_params.items():
                flat[f"{name}.kernel"] = p["kernel"]
                flat[f"{name}.bias"] = p["bias"]
            np.savez(_npz_path(), **flat)
            return jax.tree.map(jnp.asarray, np_params)
    return None


@lru_cache(maxsize=1)
def get_params(seed: int = 0) -> vgg19.Params:
    """Resolve VGG-19 params (see module docstring for the search order)."""
    # An explicitly set TBIST_VGG19_PTH wins over a stale npz cache: only
    # reuse the cache if it is at least as new as the .pth it came from.
    env_pth = os.environ.get("TBIST_VGG19_PTH", "")
    if env_pth and os.path.exists(env_pth):
        npz = _npz_path()
        stale = not os.path.exists(npz) or os.path.getmtime(npz) < os.path.getmtime(env_pth)
        if stale:
            converted = _try_torch_pth()
            if converted is not None:
                logger.info("VGG-19: converted torchvision checkpoint (env override)")
                return converted
    cached = _load_npz(_npz_path())
    if cached is not None:
        logger.info("VGG-19: loaded converted ImageNet weights from cache")
        return cached
    converted = _try_torch_pth()
    if converted is not None:
        logger.info("VGG-19: converted torchvision checkpoint")
        return converted
    from tbist_tpu.utils import degraded

    degraded.mark("vgg_params", "vgg_seeded")
    logger.warning(
        "VGG-19: no checkpoint found — using deterministic seeded init "
        "(set TBIST_VGG19_PTH to a torchvision vgg19 .pth for real weights)"
    )
    from tbist_tpu.weights.seed_cache import cached_seeded_init

    return cached_seeded_init(
        f"vgg19_seeded_s{seed}", lambda: vgg19.init_params(jax.random.key(seed))
    )
