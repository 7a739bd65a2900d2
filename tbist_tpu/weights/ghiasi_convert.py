"""Reference checkpoint converters for the feed-forward text path.

* ``image_transformer.pth`` — key ``state_dict_ghiasi`` holds the Ghiasi
  transformer (reference ghiasi_img_transformer.py:30-31) with names
  ``layers.{i}.conv.weight``, ``layers.{i}.fc_beta.weight`` etc. for the
  11-layer ModuleList.
* ``clip_text_embedding_transformer.pth`` — a plain Sequential state dict
  ``model.{0,2,4,6,8}.weight/bias`` (clip_text_embedding_transformer.py:15-28).

Resolution: ``TBIST_GHIASI_PTH`` / ``TBIST_CLIP_MLP_PTH`` env vars or
``weights_cache/`` defaults; loaders fall back to seeded init.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from tbist_tpu.models import clip_mlp, ghiasi
from tbist_tpu.utils.logging import logger

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "weights_cache"
)

# reference ModuleList index -> our layer name
_LAYER_NAMES = [
    "enc1", "enc2", "enc3",
    "res1", "res2", "res3", "res4", "res5",
    "dec1", "dec2", "dec3",
]


def _conv(sd, key):
    w = np.asarray(sd[f"{key}.weight"], np.float32)
    return {
        "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
        "bias": jnp.asarray(np.asarray(sd[f"{key}.bias"], np.float32)),
    }


def _linear(sd, key):
    return {
        "kernel": jnp.asarray(np.asarray(sd[f"{key}.weight"], np.float32).T),
        "bias": jnp.asarray(np.asarray(sd[f"{key}.bias"], np.float32)),
    }


def convert_ghiasi(sd) -> ghiasi.Params:
    params: ghiasi.Params = {}
    for i, name in enumerate(_LAYER_NAMES):
        pre = f"layers.{i}"
        if name.startswith("enc"):
            params[name] = _conv(sd, f"{pre}.conv")
        elif name.startswith("dec"):
            params[name] = _conv(sd, f"{pre}.conv")
            params[name]["fc_gamma"] = _linear(sd, f"{pre}.fc_gamma")
            params[name]["fc_beta"] = _linear(sd, f"{pre}.fc_beta")
        else:
            params[name] = {
                "conv1": _conv(sd, f"{pre}.conv1"),
                "conv2": _conv(sd, f"{pre}.conv2"),
                "fc_gamma1": _linear(sd, f"{pre}.fc_gamma1"),
                "fc_beta1": _linear(sd, f"{pre}.fc_beta1"),
                "fc_gamma2": _linear(sd, f"{pre}.fc_gamma2"),
                "fc_beta2": _linear(sd, f"{pre}.fc_beta2"),
            }
    return params


def convert_clip_mlp(sd):
    return [_linear(sd, f"model.{i}") for i in (0, 2, 4, 6, 8)]


@functools.lru_cache(maxsize=1)
def get_params() -> Tuple[Dict, list]:
    """(ghiasi_params, clip_mlp_params) from checkpoints or seeded init."""
    import jax

    g_path = os.environ.get(
        "TBIST_GHIASI_PTH", os.path.join(_CACHE_DIR, "image_transformer.pth")
    )
    m_path = os.environ.get(
        "TBIST_CLIP_MLP_PTH",
        os.path.join(_CACHE_DIR, "clip_text_embedding_transformer.pth"),
    )
    if os.path.exists(g_path) and os.path.exists(m_path):
        import torch

        ckpt = torch.load(g_path, map_location="cpu", weights_only=True)
        g_sd = ckpt.get("state_dict_ghiasi", ckpt)
        g = convert_ghiasi({k: v.numpy() for k, v in g_sd.items()})
        m_sd = torch.load(m_path, map_location="cpu", weights_only=True)
        m = convert_clip_mlp({k: v.numpy() for k, v in m_sd.items()})
        logger.info("Ghiasi/CLIP-MLP: converted reference checkpoints")
        return g, m
    from tbist_tpu.utils import degraded

    degraded.mark("text_transfer", "ghiasi_seeded")
    logger.warning(
        "Ghiasi/CLIP-MLP: no checkpoints — seeded init (set TBIST_GHIASI_PTH "
        "and TBIST_CLIP_MLP_PTH for the reference weights)"
    )
    from tbist_tpu.weights.seed_cache import cached_seeded_init

    def _seeded():
        key = jax.random.key(0)
        return (
            ghiasi.init_params(jax.random.fold_in(key, 1)),
            clip_mlp.init_params(jax.random.fold_in(key, 2)),
        )

    return cached_seeded_init("ghiasi_clip_mlp_seeded_s0", _seeded)
