"""Checkpoint/resume for the pixel-optimization loop.

The reference has no training and its 400-step optimization is not
resumable (SURVEY §5 checkpoint/resume). Here any long run can be chunked:
``stylize_resumable`` executes the jitted loop in segments and persists
``(pixels, step)`` with orbax between segments, so a preempted job (or a
UI "continue refining" button) resumes from the checkpointed pixels.
L-BFGS curvature history deliberately restarts per segment (bounded
memory; the history rebuilds within a few iterations) — ``save_state``
accepts an ``opt_state`` slot for callers that want to persist it.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tbist_tpu.optimize import gatys
from tbist_tpu.utils.config import GatysConfig
from tbist_tpu.utils.logging import logger


def _ckpt_dir(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return os.path.abspath(path)


def save_state(path: str, pixels: jnp.ndarray, opt_state, step: int) -> None:
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(
            os.path.join(_ckpt_dir(path), f"step_{step}"),
            {"pixels": pixels, "opt_state": opt_state, "step": np.int64(step)},
            force=True,
        )


def latest_step(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    steps = [
        int(d.split("_")[1])
        for d in os.listdir(path)
        if d.startswith("step_") and d.split("_")[1].isdigit()
    ]
    return max(steps) if steps else None


def load_state(path: str, step: int):
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(os.path.join(_ckpt_dir(path), f"step_{step}"))


def stylize_resumable(
    content: jnp.ndarray,
    styles: Sequence[jnp.ndarray],
    cfg: GatysConfig,
    vgg_params,
    ckpt_path: str,
    segment_steps: int = 100,
) -> Tuple[jnp.ndarray, list]:
    """Gatys stylization in resumable segments.

    Each segment is one jitted ``num_steps=segment_steps`` run seeded from
    the checkpointed pixels; L-BFGS history restarts per segment (bounded
    memory, same as torch restarting after a checkpoint reload). Returns
    (image, loss history across all segments run in this call).
    """
    import dataclasses

    start = latest_step(ckpt_path)
    if start is not None:
        state = load_state(ckpt_path, start)
        img = jnp.asarray(state["pixels"])
        logger.info("resuming optimization at step %d", start)
    else:
        start = 0
        if cfg.random_init:
            img = jax.random.normal(
                jax.random.key(cfg.seed), content.shape, jnp.float32
            )
        else:
            img = content.astype(jnp.float32)

    history = []
    step = start
    while step < cfg.num_steps:
        # content/style targets stay anchored to the ORIGINAL content;
        # only the starting pixels come from the checkpoint. Clamp the last
        # segment so the total never overshoots cfg.num_steps.
        remaining = min(segment_steps, cfg.num_steps - step)
        seg_cfg = dataclasses.replace(cfg, num_steps=remaining, random_init=False)
        img, hist = gatys.stylize(content, styles, seg_cfg, vgg_params, init=img)
        step += remaining
        history.extend(float(x) for x in jax.device_get(hist))
        save_state(ckpt_path, img, None, step)
        logger.info("checkpointed optimization at step %d", step)
    return img, history
