"""Extended benchmark suite — the SURVEY §6 metric table.

Measures on the current JAX backend (TPU under axon; CPU elsewhere):
  1. Gatys 512px LBFGS iterations/sec (headline — also in bench.py)
  2. FastTextTransfer feed-forward 512px latency (Ghiasi + CLIP-MLP)
  3. Mask-extraction latency (DINO+SAM when weights exist, else fallback)
  4. Batched video stylization throughput (frames/sec, dp-batched)
  5. Emoji-mask merge latency (device scatter-add vs the reference's
     pure-Python loops measured inline)

With ``--models``, also measures the heavy model-family forwards with
seeded weights (SAM, GroundingDINO, Depth-Anything, T5, Ghiasi) —
reproducing the numbers in PARITY.md.

Writes benchmarks/results.json and prints one JSON line per metric.
Run: python benchmarks/suite.py [--quick] [--models]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _timeit(fn, warmup=1, iters=5):
    for _ in range(warmup):
        np.asarray(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def _model_metrics(results):
    import jax
    import jax.numpy as jnp

    key = jax.random.key(0)

    from tbist_tpu.models import sam

    sam_params = sam.init_params(key, sam.BASE)
    rng = np.random.default_rng(0)
    img = (rng.random((480, 640, 3)) * 255).astype(np.uint8)
    boxes = np.asarray([[100.0, 100.0, 400.0, 380.0]], np.float32)
    dt = _timeit(lambda: jnp.asarray(sam.predict_boxes(sam_params, sam.BASE, img, boxes)),
                 warmup=1, iters=3)
    results["sam_vitb_predict_ms"] = dt * 1e3
    del sam_params

    from tbist_tpu.models import dino

    dino_params = dino.init_params(key)
    dimg = jax.random.uniform(key, (1, 480, 640, 3), jnp.float32)
    ids = jnp.asarray([[101, 4049, 1012, 102]], jnp.int32)
    mask = jnp.ones_like(ids)
    fwd = jax.jit(lambda p, i, t, m: dino.forward(p, dino.BASE, i, t, m))
    dt = _timeit(lambda: fwd(dino_params, dimg, ids, mask)["pred_boxes"],
                 warmup=1, iters=3)
    results["groundingdino_forward_ms"] = dt * 1e3
    del dino_params

    from tbist_tpu.models import depth_anything as da

    da_params = da.init_params(key)
    f = jax.jit(lambda p, x: da.predict_depth(p, da.SMALL, x))
    dt = _timeit(lambda: f(da_params, dimg), warmup=1, iters=3)
    results["depth_anything_small_ms"] = dt * 1e3
    del da_params

    from tbist_tpu.models import t5

    t5_params = t5.init_params(key)
    tids = jnp.asarray([[21603, 10, 3, 9, 1712, 1]], jnp.int32)
    tmask = jnp.ones_like(tids, jnp.float32)
    dt = _timeit(
        lambda: t5.generate(t5_params, t5.BASE, tids, tmask, key, max_len=16),
        warmup=1, iters=3,
    )
    results["t5_base_decode16_ms"] = dt * 1e3


def main(quick: bool = False, models: bool = False):
    import jax
    import jax.numpy as jnp

    from tbist_tpu.effects import text_transfer
    from tbist_tpu.models import vgg19
    from tbist_tpu.ops import masks
    from tbist_tpu.optimize import gatys
    from tbist_tpu.parallel import batched
    from tbist_tpu.utils.config import GatysConfig

    results = {}
    key = jax.random.key(0)
    vgg_params = vgg19.init_params(key)
    content = jax.random.uniform(jax.random.key(1), (1, 512, 512, 3), jnp.float32)
    style = jax.random.uniform(jax.random.key(2), (1, 512, 512, 3), jnp.float32)

    # 1. Gatys iters/sec
    steps = 100 if quick else 400
    cfg = GatysConfig(num_steps=steps)
    dt = _timeit(lambda: gatys.stylize(content, [style], cfg, vgg_params)[1],
                 warmup=1, iters=1)
    results["gatys_512px_iters_per_sec"] = steps / dt

    # 2. feed-forward text stylization latency
    g_params, m_params = text_transfer.default_params()
    emb = text_transfer.fallback_text_embedding("starry night")
    dt = _timeit(
        lambda: text_transfer._transfer_jit(g_params, m_params, content, emb),
        warmup=1, iters=3 if quick else 10,
    )
    results["fast_text_transfer_512px_ms"] = dt * 1e3

    # 3. mask extraction latency (whatever extractor resolves)
    from tbist_tpu.effects import masking

    extractor = masking.default_mask_extractor()
    dt = _timeit(lambda: extractor(content, "boat"), warmup=1, iters=3)
    results["mask_extraction_ms"] = dt * 1e3

    # 4. batched video throughput (8 frames, 100 steps)
    frames = jax.random.uniform(jax.random.key(3), (8, 256, 256, 3), jnp.float32)
    vcfg = GatysConfig(num_steps=20 if quick else 100)

    def video_run():
        return batched.run(vcfg, vgg_params, frames, (style,))

    dt = _timeit(video_run, warmup=1, iters=1)
    results["video_frames_per_sec_256px"] = 8 / dt

    # 5. emoji merge latency (512px mask, 172px stencil)
    seg = jnp.zeros((512, 512), bool).at[128:384, 128:384].set(True)
    emoji = jax.random.uniform(jax.random.key(4), (172, 172)) > 0.5
    dt = _timeit(
        lambda: masks.merge_content_style_masks(seg, emoji, 95, 0.5),
        warmup=1, iters=3,
    )
    results["emoji_merge_512px_ms"] = dt * 1e3

    if models:
        _model_metrics(results)

    out_path = os.path.join(REPO, "benchmarks", "results.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    for k, v in results.items():
        print(json.dumps({"metric": k, "value": round(v, 3)}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--models", action="store_true")
    args = ap.parse_args()
    main(args.quick, args.models)
