"""Round-4b probe: where do the masked-text video chunk's 5 s go?

Times each device program of the lane separately at B=1 vs B=8 on the
real TPU (seeded weights — same programs/shapes as weights-loaded):
DINO forward, SAM image encoder, vmapped SAM decode, Ghiasi, composite.
Scalar-fetch timing per CLAUDE.md (no array fetches inside loops).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, warmup=1, iters=5):
    for _ in range(warmup):
        r = fn()
    jnp.sum(r if isinstance(r, jnp.ndarray) else r[0]).block_until_ready()
    # force one scalar fetch so axon timers are honest
    float(jnp.sum(r if isinstance(r, jnp.ndarray) else r[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    float(jnp.sum(r if isinstance(r, jnp.ndarray) else r[0]))
    return (time.perf_counter() - t0) / iters


def main():
    from tbist_tpu.models import dino as dino_lib
    from tbist_tpu.models import dino_sam, sam as sam_lib
    from tbist_tpu.models import ghiasi, clip_mlp

    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    print("devices:", jax.devices())

    dino_params = dino_lib.init_params(jax.random.fold_in(key, 1), dino_lib.BASE)
    sam_params = sam_lib.init_params(jax.random.fold_in(key, 2), sam_lib.BASE)
    vocab = {"[CLS]": 101, "[SEP]": 102, "[UNK]": 100, "car": 2482, ".": 1012}

    h = w = 256
    for b in (1, 8):
        frames = rng.integers(0, 255, (b, h, w, 3), dtype=np.uint8)
        frames_dev = dino_sam._device_uint8(frames)

        # --- DINO forward (dispatch + logits fetch, as the lane does) ---
        def dino_run():
            _, out = dino_sam._detect_dispatch_batch(
                dino_params, frames_dev, "car.", vocab
            )
            return out["pred_logits"]

        t = timeit(dino_run, warmup=1, iters=3)
        print(f"B={b} dino_forward_ms {t*1e3:.1f} ({t*1e3/b:.1f}/frame)")

        # --- SAM image encoder ---
        def sam_enc():
            embs, scale, nh, nw = sam_lib.encode_uint8_batch(
                sam_params, sam_lib.BASE, frames_dev
            )
            return embs

        t = timeit(sam_enc, warmup=1, iters=3)
        print(f"B={b} sam_encode_ms {t*1e3:.1f} ({t*1e3/b:.1f}/frame)")

        # --- vmapped SAM decode at K=1 ---
        embs, scale, nh, nw = sam_lib.encode_uint8_batch(
            sam_params, sam_lib.BASE, frames_dev
        )
        boxes = np.tile(np.asarray([[[60.0, 60.0, 200.0, 220.0]]], np.float32), (b, 1, 1))
        valid = np.ones((b, 1), bool)

        def sam_dec():
            return sam_lib.masks_from_embedding_batch(
                sam_params, sam_lib.BASE, embs, scale, nh, nw, h, w, boxes, valid
            )

        t = timeit(sam_dec, warmup=1, iters=3)
        print(f"B={b} sam_decode_ms {t*1e3:.1f} ({t*1e3/b:.1f}/frame)")

    del dino_params, sam_params


if __name__ == "__main__" and "--trace" not in sys.argv:
    main()


def parse_trace(log_dir):
    """Sum device-track op durations from the newest trace.json.gz."""
    import glob
    import gzip
    import json as json_lib
    from collections import defaultdict

    paths = sorted(glob.glob(log_dir + "/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(paths[-1], "rt") as f:
        data = json_lib.load(f)
    events = data.get("traceEvents", [])
    # device tracks: pid names containing "TPU" / "/device:"
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {
        p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()
    }
    tot = defaultdict(float)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            tot[e.get("name", "?")] += e.get("dur", 0.0)
    return tot


def trace_mode():
    from tbist_tpu.models import dino as dino_lib
    from tbist_tpu.models import dino_sam
    from tbist_tpu.utils import prof

    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    dino_params = dino_lib.init_params(jax.random.fold_in(key, 1), dino_lib.BASE)
    vocab = {"[CLS]": 101, "[SEP]": 102, "[UNK]": 100, "car": 2482, ".": 1012}
    h = w = 256
    tots = {}
    for b in (1, 8):
        frames = rng.integers(0, 255, (b, h, w, 3), dtype=np.uint8)
        frames_dev = dino_sam._device_uint8(frames)

        def dino_run():
            _, out = dino_sam._detect_dispatch_batch(
                dino_params, frames_dev, "car.", vocab
            )
            return out["pred_logits"]

        float(jnp.sum(dino_run()))  # compile outside the trace
        log_dir = f"/tmp/dino_trace_b{b}"
        with prof.trace(log_dir):
            float(jnp.sum(dino_run()))
        tots[b] = parse_trace(log_dir)

    # top ops at B=8 with their B=1 counterpart (per-frame scaling)
    top8 = sorted(tots[8].items(), key=lambda kv: -kv[1])[:25]
    print(f"{'op':60s} {'B8_ms':>9s} {'B1_ms':>9s} {'x_perfrm':>8s}")
    for name, dur8 in top8:
        d1 = tots[1].get(name, 0.0)
        ratio = (dur8 / 8) / d1 if d1 else float("inf")
        print(f"{name[:60]:60s} {dur8/1e3:9.2f} {d1/1e3:9.2f} {ratio:8.2f}")
    print("total device us  B8:", sum(tots[8].values()), " B1:", sum(tots[1].values()))


if __name__ == "__main__" and "--trace" in sys.argv:
    trace_mode()
    sys.exit(0)
