"""Headline benchmark: Gatys 512px stylization iterations/sec on TPU.

Prints ONE JSON line:
  {"metric": "gatys_512px_iters_per_sec", "value": N, "unit": "iters/s",
   "vs_baseline": R}

The baseline is the reference's CPU PyTorch LBFGS loop (the reference
publishes no numbers — BASELINE.md), measured by
benchmarks/baseline_torch.py and cached in benchmarks/baseline_cpu.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SIZE = 512
STEPS = 400


def _baseline_ips() -> float:
    cache = os.path.join(REPO, "benchmarks", "baseline_cpu.json")
    if os.path.exists(cache):
        with open(cache) as f:
            return float(json.load(f)["iters_per_sec"])
    from benchmarks import baseline_torch

    result = baseline_torch.run(size=SIZE, iters=10)
    with open(cache, "w") as f:
        json.dump(result, f)
    return float(result["iters_per_sec"])


def _watchdog(seconds: float):
    """Emit an error JSON line and exit if no result lands in time.

    The axon TPU tunnel can hang indefinitely (even jax.devices() blocks
    when it is down); a hung bench run records nothing at all, so fail
    loudly with the one-line contract instead. 1800 s is ~6x a normal
    cold run (compile ~110 s + 400-iter run + CPU-baseline cache read)."""
    import threading

    def boom():
        print(
            json.dumps(
                {
                    "metric": "gatys_512px_iters_per_sec",
                    "value": None,
                    "unit": "iters/s",
                    "vs_baseline": None,
                    "error": f"no TPU result within {seconds:.0f}s "
                    "(axon tunnel unresponsive?)",
                }
            ),
            flush=True,
        )
        os._exit(2)

    t = threading.Timer(seconds, boom)
    t.daemon = True
    t.start()
    return t


def main() -> None:
    watchdog = _watchdog(1800.0)
    import jax
    import jax.numpy as jnp

    from tbist_tpu.models import vgg19
    from tbist_tpu.optimize import gatys
    from tbist_tpu.utils.config import GatysConfig
    from tbist_tpu.utils.imageio import load_image, to_device

    cfg = GatysConfig(num_steps=STEPS, optimizer="lbfgs")
    params = vgg19.init_params(jax.random.key(0))

    content_path = os.path.join(REPO, "data/content_imgs/boat.jpg")
    style_path = os.path.join(REPO, "data/style_imgs/starry_night.jpg")
    if os.path.exists(content_path):
        content = to_device(load_image(content_path), bucket=cfg.shape_bucket,
                            max_side=SIZE)
        style = to_device(load_image(style_path), bucket=cfg.shape_bucket,
                          max_side=SIZE)
    else:
        content = jax.random.uniform(jax.random.key(1), (1, SIZE, SIZE, 3))
        style = jax.random.uniform(jax.random.key(2), (1, SIZE, SIZE, 3))

    import numpy as np

    # compile (cached afterwards); fetch to host — block_until_ready alone
    # is unreliable on the experimental axon platform
    out, _ = gatys.stylize(content, [style], cfg, params)
    np.asarray(out)

    t0 = time.perf_counter()
    out, hist = gatys.stylize(content, [style], cfg, params)
    np.asarray(out)
    dt = time.perf_counter() - t0
    ips = STEPS / dt

    try:
        baseline = _baseline_ips()
        vs = ips / baseline
    except Exception:
        vs = None

    watchdog.cancel()
    print(
        json.dumps(
            {
                "metric": "gatys_512px_iters_per_sec",
                "value": round(ips, 2),
                "unit": "iters/s",
                "vs_baseline": round(vs, 2) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
