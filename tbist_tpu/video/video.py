"""Video pipeline: decode → batched device effects → interpolate → encode.

Reference: app.py:742-864 — a strictly sequential per-frame Python loop
that writes every frame to a temp JPG, re-reads it, runs the image
pipeline, then optionally inserts cross-dissolve frames and adjusts fps.

TPU-native design: EVERY path streams with constant host memory in video
length — decode-ahead chunks, device programs, on-device per-chunk
cross-dissolve, ordered fetch workers, streaming mp4 encode. Pure
style/text/mixing requests batch frames over the ``dp`` mesh axis
(parallel.batched / the Ghiasi forward); batch-safe simple chains
(grayscale / pixel art / palette) send whole chunks through one
``apply_image`` program; chains with per-frame host stages (text masks,
depth) run frame-at-a-time, still streaming.
"""

from __future__ import annotations

import functools
import math
import os
import tempfile
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tbist_tpu.compose import pipeline as pipe
from tbist_tpu.utils.config import EffectRequest
from tbist_tpu.utils.imageio import bucket_shape
from tbist_tpu.utils.logging import RunMetrics, logger


def read_frames(video_path: str, max_frames: Optional[int] = None):
    """Decode to (frames list of HxWx3 uint8 RGB, fps)."""
    import cv2

    cap = cv2.VideoCapture(video_path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 24.0
    frames = []
    while cap.isOpened():
        ret, frame = cap.read()
        if not ret:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        if max_frames and len(frames) >= max_frames:
            break
    cap.release()
    return frames, fps


def probe_fps(video_path: str) -> float:
    """Container fps without decoding any frames."""
    import cv2

    cap = cv2.VideoCapture(video_path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 24.0
    cap.release()
    return fps


def read_frame_chunks(
    video_path: str,
    chunk_size: int,
    max_frames: Optional[int] = None,
    rgb: bool = True,
):
    """Decode ``chunk_size`` frames at a time: (B, H, W, 3) uint8 chunks.

    Constant memory in video length — the streaming batched paths consume
    this instead of ``read_frames`` so a long video never materializes on
    the host (reference app.py:784-815 buffers via per-frame temp JPGs).
    ``rgb=False`` keeps cv2's native BGR (the device program flips
    channels for free; saves one host cvtColor per frame each way)."""
    import cv2

    cap = cv2.VideoCapture(video_path)
    try:
        buf: List[np.ndarray] = []
        n = 0
        while cap.isOpened():
            ret, frame = cap.read()
            if not ret:
                break
            buf.append(
                cv2.cvtColor(frame, cv2.COLOR_BGR2RGB) if rgb else frame
            )
            n += 1
            if len(buf) == chunk_size:
                yield np.stack(buf)
                buf = []
            if max_frames and n >= max_frames:
                break
        if buf:
            yield np.stack(buf)
    finally:
        cap.release()


class _Prefetch:
    """Decode-ahead: pull chunks from a generator on ONE worker thread
    with a bounded queue. cv2 decode releases the GIL, so on the 1-core
    host the next chunk decodes inside the current chunk's axon link
    wait instead of serializing before it (PROFILE.md round-3j)."""

    _END = object()

    def __init__(self, gen, depth: int = 2):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None
        self._stop = False

        def run():
            try:
                for item in gen:
                    while not self._stop:
                        try:
                            self._q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if self._stop:
                        gen.close()  # release the cv2 capture promptly
                        break
            except BaseException as e:  # re-raised on the consumer side
                self._err = e
            finally:
                while True:  # END must land even if the queue is full
                    try:
                        self._q.put(self._END, timeout=0.1)
                        break
                    except queue.Full:
                        if self._stop:
                            break

        self._t = threading.Thread(target=run, daemon=True)
        self._t.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._END:
            self._t.join()
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self) -> None:
        """Abort: unblock and join the worker (consumer died mid-video —
        without this a full queue would pin the decode thread and its
        cv2 capture for the life of a serve process)."""
        import queue

        self._stop = True
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._t.join(timeout=5)


def _open_writer(out_path: str, fps: float, w: int, h: int):
    import cv2

    for codec in ("avc1", "mp4v"):
        fourcc = cv2.VideoWriter_fourcc(*codec)
        out = cv2.VideoWriter(out_path, fourcc, fps, (w, h))
        if out.isOpened():
            return out
    raise RuntimeError(
        f"no usable mp4 codec (tried avc1, mp4v) for {out_path}"
    )


def write_video(frames: List[np.ndarray], fps: float, out_path: str) -> str:
    import cv2

    h, w = frames[0].shape[:2]
    out = _open_writer(out_path, fps, w, h)
    for f in frames:
        out.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    out.release()
    return out_path


class _StreamWriter:
    """Encode frames as fetch workers deliver them (cv2 releases the GIL,
    so encoding hides inside the next chunk's link wait). Opened lazily on
    the first chunk — the processed frame size is not known up front."""

    def __init__(self, out_path: str, fps: float, bgr: bool = False):
        self._out_path = out_path
        self._fps = fps
        self._wr = None
        self._bgr = bgr  # chunks arrive BGR (device flipped them): no cvtColor

    def __call__(self, chunk: np.ndarray) -> None:  # (B, H, W, 3) uint8
        import cv2

        if self._wr is None:
            h, w = chunk.shape[1:3]
            self._wr = _open_writer(self._out_path, self._fps, w, h)
        for f in chunk:
            self._wr.write(f if self._bgr else cv2.cvtColor(f, cv2.COLOR_RGB2BGR))

    def close(self) -> None:
        if self._wr is not None:
            self._wr.release()


def cross_dissolve(frames: List[np.ndarray], k: int) -> List[np.ndarray]:
    """Insert k interpolated frames between every consecutive pair
    (alpha = (i+1)/(k+1), reference app.py:820-838), vectorized on device."""
    if k <= 0 or len(frames) < 2:
        return frames
    alphas = jnp.asarray([(i + 1) / (k + 1) for i in range(k)], jnp.float32)
    prev = jnp.asarray(np.stack(frames[:-1]), jnp.float32)  # (N-1, H, W, C)
    nxt = jnp.asarray(np.stack(frames[1:]), jnp.float32)
    # (N-1, k, H, W, C) lerp in one fused op
    interp = (
        prev[:, None] * (1.0 - alphas[None, :, None, None, None])
        + nxt[:, None] * alphas[None, :, None, None, None]
    )
    # clip + truncating cast ON DEVICE (XLA float->int converts round
    # toward zero, same as np.astype), then fetch uint8: 4x fewer bytes
    interp_np = np.asarray(jnp.clip(interp, 0, 255).astype(jnp.uint8))
    out = [frames[0]]
    for i in range(len(frames) - 1):
        out.extend(interp_np[i])
        out.append(frames[i + 1])
    return out


@functools.partial(jax.jit, static_argnames=("k",))
def _dissolve_chunk_jit(prev_u8, chunk_u8, k):
    """Per-chunk cross-dissolve ON DEVICE: for each consecutive pair
    (prev, c0), (c0, c1), ... emit k lerped frames then the right frame —
    (B, H, W, C) uint8 -> (B*(k+1), H, W, C) uint8. Same alpha/clip/
    truncate semantics as ``cross_dissolve`` (reference app.py:820-838);
    chunking it lets interpolated videos stream with constant host
    memory, and the lerp itself rides the device instead of the 1-core
    host."""
    alphas = jnp.asarray([(i + 1) / (k + 1) for i in range(k)], jnp.float32)
    prevs = jnp.concatenate([prev_u8, chunk_u8[:-1]], 0).astype(jnp.float32)
    nxt = chunk_u8.astype(jnp.float32)
    a = alphas[None, :, None, None, None]
    interp = prevs[:, None] * (1.0 - a) + nxt[:, None] * a  # (B, k, H, W, C)
    interp = jnp.clip(interp, 0, 255).astype(jnp.uint8)
    out = jnp.concatenate([interp, chunk_u8[:, None]], 1)  # (B, k+1, ...)
    return out.reshape((-1,) + chunk_u8.shape[1:])


def _dissolve_step(prev, chunk_u8, k: int, pad: int, first: bool):
    """One streaming dissolve step over a PADDED uint8 chunk (pads repeat
    the last real frame, so their lerps are identity frames — sliced off
    below, keeping ONE compiled dissolve shape for every chunk). Returns
    (frames to emit, carry frame for the next chunk's boundary pair)."""
    if first:
        # no left boundary: self-pairs produce k dup interps before c0 —
        # slice them (and keep c0) instead of compiling a second shape
        prev = chunk_u8[:1]
    out = _dissolve_chunk_jit(prev, chunk_u8, k)
    if first:
        out = out[k:]
    if pad:
        out = out[: out.shape[0] - pad * (k + 1)]
        new_prev = chunk_u8[chunk_u8.shape[0] - pad - 1][None]
    else:
        new_prev = chunk_u8[-1:]
    return out, new_prev


def _u8_device(x: jnp.ndarray) -> jnp.ndarray:
    """Quantize frames on device before fetching — at fast-text rates
    the f32 fetch, not the model, dominated the loop (PROFILE.md 3e)."""
    from tbist_tpu.utils.imageio import to_uint8_device

    return to_uint8_device(x)


class _FetchPipeline:
    """Ordered, windowed device→host fetch over worker threads.

    The axon tunnel serves ~17 MB/s to a single fetch but ~25 MB/s
    aggregate to two concurrent ones (each stream slows ~35%, the SUM
    speeds up — measured, PROFILE.md round-3i), and the host-side
    consumer (cv2 encode) releases the GIL, so it runs for free inside
    the workers' network waits. ``submit`` enqueues a device array
    (dispatch stays async); ``drain``/``close`` yield np arrays in
    submission order. The window bounds device-resident results so a
    long video can't pile every chunk up in HBM; ``close`` flushes the
    tail in order."""

    def __init__(self, emit, workers: int = 2, window: int = 4):
        from concurrent.futures import ThreadPoolExecutor

        self._ex = ThreadPoolExecutor(max_workers=workers)
        self._futs: List = []
        self._emit = emit
        self._window = window

    def submit(self, device_arr) -> None:
        self._futs.append(self._ex.submit(np.asarray, device_arr))
        while len(self._futs) > self._window:
            self._emit(self._futs.pop(0).result())

    def close(self) -> None:
        try:
            for f in self._futs:
                self._emit(f.result())
            self._futs = []
        finally:
            self._ex.shutdown(wait=True)


@functools.partial(jax.jit, static_argnames=("dtype", "bgr"))
def _text_fwd_u8_jit(g_params, chunk_u8, style_v, dtype, bgr=False):
    """uint8 frames -> Ghiasi -> uint8, one MODULE-LEVEL jit. A
    ``jax.jit(lambda ...)`` built inside the call (the old shape) owns a
    fresh compile cache per ``apply_video`` invocation — every video
    paid the full remote axon compile (~20-40 s) again, and closing over
    ``g_params`` baked the weights in as program constants.

    ``bgr``: frames arrive AND leave in cv2's native BGR; the channel
    flips fuse into the device cast/quantize for free, so the 1-core
    host skips one cvtColor per frame each way on the streaming path."""
    from tbist_tpu.models import ghiasi
    from tbist_tpu.utils.imageio import to_uint8_device

    if bgr:
        chunk_u8 = chunk_u8[..., ::-1]
    x = chunk_u8.astype(jnp.float32) / 255.0
    out = to_uint8_device(
        ghiasi.apply(g_params, x, style_v, compute_dtype=dtype)
    )
    return out[..., ::-1] if bgr else out


def _is_pure_style_request(req: EffectRequest) -> bool:
    return (
        req.style_transfer
        and not req.grayscale
        and req.text is None
        and req.pixel_art is None
        and not req.style_mixing
        and not req.color_palette
        and req.depth is None
    )


def _is_pure_mixing_request(req: EffectRequest) -> bool:
    """Style mixing with no other stages: the batched/streaming lane
    handles it (feature-space mixed target gram in parallel.batched —
    same target as the image path). Reference capability: two-style
    mixing over video, app.py:472-590 per frame at app.py:784-815."""
    return (
        req.style_mixing
        and not req.grayscale
        and req.text is None
        and req.pixel_art is None
        and not req.style_transfer
        and not req.color_palette
        and req.depth is None
    )


def _is_pure_masked_text_request(req: EffectRequest) -> bool:
    """Masked text transfer (style prompt + location and/or texture mask)
    with no other stages: the batched masked-text lane handles it — one
    Ghiasi program + one DINO + one SAM program per frame chunk instead
    of the reference's per-frame TextMaskExtractor + transfer loop
    (text/TextMaskExtractor.py:25-68 inside app.py:784-815). Non-default
    mask preprocess options (crop/square/resize) are per-frame host work
    and stay on the general path."""
    t = req.text
    return (
        t is not None
        and bool(t.style_prompt)
        and (bool(t.location_prompt) or bool(t.texture_prompt))
        and tuple(t.mask_crop) == (0, 0, 0, 0)
        and not t.mask_square
        and not tuple(t.mask_resize)
        and not req.grayscale
        and req.pixel_art is None
        and not req.style_transfer
        and not req.style_mixing
        and not req.color_palette
        and req.depth is None
    )


def _is_pure_depth_request(req: EffectRequest) -> bool:
    """Depth-loss stylization with no other stages: the batched lane
    handles it — per-chunk depth targets from ONE batched estimator
    program, then the dp-batched Gatys loop with the in-graph depth term
    (optimize.gatys_depth semantics). Reference capability: depth mode
    over video, app.py:660-735 per frame inside :784-815. MIP mode keeps
    the per-frame general path (its per-frame layer decomposition +
    reconstruction is host-orchestrated; see effects/depth.style_mip)."""
    return (
        req.depth is not None
        and req.depth.mode == "depth_loss"
        and not req.grayscale
        and req.text is None
        and req.pixel_art is None
        and not req.style_transfer
        and not req.style_mixing
        and not req.color_palette
    )


def _is_pure_text_transfer_request(req: EffectRequest) -> bool:
    return (
        req.text is not None
        and bool(req.text.style_prompt)
        and not req.text.location_prompt
        and not req.text.texture_prompt
        and not req.grayscale
        and req.pixel_art is None
        and not req.style_transfer
        and not req.style_mixing
        and not req.color_palette
        and req.depth is None
    )


def _is_batchable_chain(req: EffectRequest) -> bool:
    """Chains whose every stage is a per-image device program with no
    per-frame host work: grayscale / pixel art / color palette, in any
    combination, with no text masks. A whole (B, H, W, 3) frame chunk
    flows through ONE ``apply_image`` call — per-image semantics hold
    because reinhard stats reduce per image and pixel-art quantization /
    Canny are per-frame (vmapped) over the batch."""
    return (
        req.text is None
        and not req.style_transfer
        and not req.style_mixing
        and req.depth is None
    )


def _u8_chunk(out: jnp.ndarray) -> jnp.ndarray:
    """Device-quantize a pipeline output chunk to uint8 for the fetch
    pipeline (float outputs; integer outputs pass through)."""
    if jnp.issubdtype(out.dtype, jnp.floating):
        return _u8_device(out)
    return jnp.asarray(out)


def _iter_chunks(stack: np.ndarray, bsz: int):
    for i in range(0, stack.shape[0], bsz):
        yield stack[i : i + bsz]


def _batched_text_transfer(
    frames: Optional[List[np.ndarray]],
    req: EffectRequest,
    sink=None,
    chunk_iter=None,
    bgr: bool = False,
    dissolve_k: int = 0,
) -> Optional[List[np.ndarray]]:
    """Feed-forward Ghiasi stylization of all frames in dp batches: the
    prompt embeds once, then one jitted forward per frame batch (the
    reference re-runs CLIP + Ghiasi per frame through the full image
    pipeline, app.py:794). With >1 device the batch shards over the
    production dp-only mesh and weights replicate.

    ``sink``: optional callable receiving each fetched (B, H, W, 3)
    uint8 chunk in order (streaming encode); None collects and returns
    the frame list. Fetches ride a 2-worker pipeline either way
    (_FetchPipeline).

    ``chunk_iter``: optional iterator of (B<=bsz, H, W, 3) uint8 chunks
    replacing ``frames`` (streaming decode — constant host memory).
    ``bgr``: chunks are cv2-native BGR and emissions stay BGR (the
    device program flips channels; host does zero cvtColor work).
    ``dissolve_k``: insert k cross-dissolve frames between consecutive
    output frames, on device per chunk (_dissolve_step)."""
    from tbist_tpu.effects import text_transfer as tt
    from tbist_tpu.models import clip_mlp, ghiasi
    from tbist_tpu.parallel import mesh as mesh_lib

    g_params, m_params = tt.default_params()
    from tbist_tpu.models import clip_text

    emb = tt._pooled_embedding(
        req.text.style_prompt, clip_text.get_default_encoder()
    )
    style = clip_mlp.apply(m_params, emb)  # (1, 100)

    mesh = mesh_lib.production_mesh(dp_only=True)
    dp = mesh.shape[mesh_lib.DP_AXIS] if mesh is not None else 1
    if mesh is not None:
        g_params = jax.device_put(g_params, mesh_lib.replicated(mesh))
        style = jax.device_put(style, mesh_lib.replicated(mesh))

    cd = tt.compute_dtype()  # TBIST_GHIASI_BF16 streams activations bf16
    bsz = _chunk_size(req.video.frame_batch, dp)
    outs: List[np.ndarray] = []
    emit = sink if sink is not None else (lambda arr: outs.extend(arr))
    if chunk_iter is None:
        # host uint8; upload per chunk, cast on device
        chunk_iter = _iter_chunks(np.stack(frames), bsz)
    fetches = _FetchPipeline(emit)
    prev = None
    try:  # dispatch is async: the device computes chunk i+1 while the
        # fetch workers drain chunk i and ``emit`` encodes chunk i-1
        for i, raw in enumerate(chunk_iter):
            chunk, pad = _pad_chunk(raw, bsz, dp, first=i == 0)
            chunk = _upload(chunk, mesh)
            sv = jnp.broadcast_to(style, (chunk.shape[0], style.shape[1]))
            res = _text_fwd_u8_jit(g_params, chunk, sv, cd, bgr)
            if dissolve_k:
                res, prev = _dissolve_step(prev, res, dissolve_k, pad, i == 0)
            elif pad:
                res = res[:-pad]
            fetches.submit(res)
    finally:
        fetches.close()
    return None if sink is not None else outs


@functools.partial(jax.jit, static_argnames=("dtype",))
def _text_fwd_f32_jit(g_params, chunk_u8, style_v, dtype):
    """uint8 frames -> Ghiasi styled f32 (the masked lane composites
    before quantizing, so unlike _text_fwd_u8_jit this stays float)."""
    from tbist_tpu.models import ghiasi

    x = chunk_u8.astype(jnp.float32) / 255.0
    return ghiasi.apply(g_params, x, style_v, compute_dtype=dtype)


@functools.partial(jax.jit, static_argnames=("edge",))
def _composite_loc_u8_jit(chunk_u8, styled, masks, edge):
    from tbist_tpu.ops import masks as mask_ops

    x = chunk_u8.astype(jnp.float32) / 255.0
    out = mask_ops.composite_by_masks_batch(x, styled, masks, edge)
    return _u8_device(out)


@functools.partial(jax.jit, static_argnames=("blur", "step"))
def _composite_emoji_u8_jit(chunk_u8, styled, seg_masks, emoji, blur, step, strength):
    from tbist_tpu.ops import masks as mask_ops

    x = chunk_u8.astype(jnp.float32) / 255.0
    out = mask_ops.emoji_composite_batch(
        x, styled, seg_masks, emoji, blur, step, strength
    )
    return _u8_device(out)


@jax.jit
def _composite_shared_u8_jit(chunk_u8, styled, m):
    x = chunk_u8.astype(jnp.float32) / 255.0
    return _u8_device(x * (1.0 - m) + styled * m)


def _batched_masked_text(
    req: EffectRequest,
    registry: Optional[pipe.ModelRegistry],
    sink=None,
    chunk_iter=None,
    dissolve_k: int = 0,
) -> Optional[List[np.ndarray]]:
    """Masked text-transfer over video frames, chunk-batched end to end.

    Per (B, H, W, 3) chunk: ONE Ghiasi program styles all frames, ONE
    GroundingDINO + ONE SAM program extract all B location masks
    (models.dino_sam.extract_masks_batch — text features computed once
    per prompt), and the composite runs batched on device. The reference
    runs the whole TextMaskExtractor + transfer chain serially per frame
    (text/TextMaskExtractor.py:25-68 inside app.py:784-815). With a
    texture prompt but NO location prompt the merged emoji mask is
    frame-independent (seg mask = all-ones), so it computes once and
    broadcasts. Frames shard over the production dp mesh like the other
    lanes; model params replicate."""
    from tbist_tpu.effects import masking as masking_fx
    from tbist_tpu.effects import text_transfer as tt
    from tbist_tpu.models import clip_mlp, clip_text
    from tbist_tpu.ops import masks as mask_ops
    from tbist_tpu.parallel import mesh as mesh_lib

    tcfg = req.text
    g_params, m_params = tt.default_params()
    emb = tt._pooled_embedding(tcfg.style_prompt, clip_text.get_default_encoder())
    style = clip_mlp.apply(m_params, emb)
    cd = tt.compute_dtype()
    has_l, has_x = bool(tcfg.location_prompt), bool(tcfg.texture_prompt)

    registry = registry or pipe.ModelRegistry()
    extract = None
    if has_l:
        registry.ensure("batch_mask_extractor")
        extract = registry.batch_mask_extractor
    emoji = None
    if has_x:
        registry.ensure("emoji_extractor")
        emoji = jnp.asarray(registry.emoji_extractor(tcfg.texture_prompt))

    mesh = mesh_lib.production_mesh(dp_only=True)
    dp = mesh.shape[mesh_lib.DP_AXIS] if mesh is not None else 1
    if mesh is not None:
        g_params = jax.device_put(g_params, mesh_lib.replicated(mesh))
        style = jax.device_put(style, mesh_lib.replicated(mesh))
        if emoji is not None:
            emoji = jax.device_put(emoji, mesh_lib.replicated(mesh))
        logger.info("video: masked-text lane sharding over dp=%d", dp)

    bsz = _chunk_size(req.video.frame_batch, dp)
    outs: List[np.ndarray] = []
    emit = sink if sink is not None else (lambda arr: outs.extend(arr))
    fetches = _FetchPipeline(emit)
    prev = None
    shared_m = None
    try:
        for i, raw in enumerate(chunk_iter):
            chunk, pad = _pad_chunk(raw, bsz, dp, first=i == 0)
            chunk_dev = _upload(chunk, mesh)
            sv = jnp.broadcast_to(style, (chunk_dev.shape[0], style.shape[1]))
            # dispatch the image-only styling FIRST: the device runs it
            # while extract() blocks the host on DINO's logits
            styled = _text_fwd_f32_jit(g_params, chunk_dev, sv, cd)
            if has_l:
                masks = jnp.asarray(
                    extract(chunk_dev, tcfg.location_prompt,
                            **masking_fx._detection_kwargs(tcfg))
                )
                if mesh is not None:
                    masks = jax.device_put(masks, mesh_lib.mask_sharding(mesh))
                if has_x:
                    res = _composite_emoji_u8_jit(
                        chunk_dev, styled, masks, emoji,
                        int(tcfg.emoji_blur_strength),
                        float(tcfg.emoji_step_size),
                        tcfg.emoji_style_strength,
                    )
                else:
                    res = _composite_loc_u8_jit(
                        chunk_dev, styled, masks, int(tcfg.edge_smoothing)
                    )
            else:
                if shared_m is None:
                    h, w = chunk_dev.shape[1:3]
                    merged = mask_ops.merge_content_style_masks(
                        jnp.ones((h, w), bool), emoji,
                        int(tcfg.emoji_blur_strength),
                        float(tcfg.emoji_step_size),
                    )
                    shared_m = jnp.clip(
                        merged * tcfg.emoji_style_strength, 0.0, 1.0
                    )[None, ..., None]
                    if mesh is not None:
                        shared_m = jax.device_put(
                            shared_m, mesh_lib.replicated(mesh)
                        )
                res = _composite_shared_u8_jit(chunk_dev, styled, shared_m)
            if dissolve_k:
                res, prev = _dissolve_step(prev, res, dissolve_k, pad, i == 0)
            elif pad:
                res = res[:-pad]
            fetches.submit(res)
            logger.info("video: masked-text chunk %d dispatched", i)
    finally:
        fetches.close()
    return None if sink is not None else outs


def _chunk_size(frame_batch: int, dp: int) -> int:
    """Frame-chunk size: at least one frame per dp shard, rounded UP to a
    dp multiple so every padded chunk tiles evenly over the mesh (a bsz
    that is not a dp multiple would make jax.device_put reject the
    sharding)."""
    bsz = max(frame_batch, dp)
    return -(-bsz // dp) * dp


def _pad_chunk(chunk: np.ndarray, bsz: int, dp: int, first: bool):
    """Pad a host frame chunk by repeating the last frame. Non-first short
    chunks pad to ``bsz`` (keep one compiled shape); a lone first chunk
    pads only to the next dp multiple (smaller program)."""
    target = bsz if not first else -(-chunk.shape[0] // dp) * dp
    pad = target - chunk.shape[0]
    if pad:
        chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, axis=0)], 0)
    return chunk, pad


def _upload(chunk: np.ndarray, mesh) -> jnp.ndarray:
    """Ship a uint8 frame chunk to device(s); cast happens on device (4x
    fewer bytes through the host link than f32)."""
    from tbist_tpu.parallel import mesh as mesh_lib

    if mesh is not None:
        return jax.device_put(chunk, mesh_lib.batch_sharding(mesh))
    return jnp.asarray(chunk)


def apply_video(
    video_path: str,
    req: EffectRequest,
    inputs: Optional[pipe.EffectInputs] = None,
    registry: Optional[pipe.ModelRegistry] = None,
    out_path: Optional[str] = None,
    max_frames: Optional[int] = None,
    metrics: Optional[RunMetrics] = None,
) -> Optional[str]:
    """Process a video through the effect chain. Returns the mp4 path."""
    if not video_path:
        return None
    inputs = inputs or pipe.EffectInputs()
    vcfg = req.video

    pure_style = _is_pure_style_request(req) and inputs.style_image is not None
    pure_text = _is_pure_text_transfer_request(req)
    pure_masked_text = _is_pure_masked_text_request(req)
    mix_styles = tuple(
        s for s in (inputs.style_image1, inputs.style_image2) if s is not None
    )
    pure_mixing = _is_pure_mixing_request(req) and len(mix_styles) > 0
    pure_depth = _is_pure_depth_request(req) and inputs.style_image is not None

    fps = probe_fps(video_path)
    new_fps = fps * (vcfg.interpolation_frames + 1) if vcfg.interpolation_frames else fps
    if vcfg.slowmo:
        # floor matches app.py:850-851 exactly; the max(1,·) guard is an
        # intended divergence (reference writes fps=0 mp4s when
        # floor(fps*speed)==0, e.g. 8fps at 0.1x — PARITY.md).
        new_fps = max(1, math.floor(new_fps * vcfg.slowmo))
    if out_path is None:
        out_path = os.path.join(tempfile.mkdtemp(), "output_video.mp4")

    if pure_style or pure_text or pure_mixing or pure_masked_text or pure_depth:
        # Fully streaming fast path: decode-ahead worker (constant host
        # memory in video length) -> batched device program -> ordered
        # fetch workers -> streaming mp4 encode. cv2 decode/encode both
        # release the GIL, so on the 1-core host they hide inside the
        # axon link waits. Cross-dissolve rides the device per chunk
        # (_dissolve_step carries the boundary frame), so interpolated
        # videos stream too. The text path additionally stays in
        # cv2-native BGR end-to-end (channels flip on device for free).
        # Style MIXING takes the same lane with a feature-space-mixed
        # target gram (parallel.batched; parity with the image path).
        from tbist_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.production_mesh(dp_only=True)
        dp = mesh.shape[mesh_lib.DP_AXIS] if mesh is not None else 1
        bsz = _chunk_size(vcfg.frame_batch, dp)
        bgr = pure_text
        chunks = _Prefetch(
            read_frame_chunks(video_path, bsz, max_frames, rgb=not bgr)
        )
        first = next(chunks, None)
        if first is None:
            return None
        import itertools

        chunk_iter = itertools.chain([first], chunks)
        writer = _StreamWriter(out_path, new_fps, bgr=bgr)
        try:
            if pure_text:
                _batched_text_transfer(
                    None, req, sink=writer, chunk_iter=chunk_iter, bgr=True,
                    dissolve_k=vcfg.interpolation_frames,
                )
            elif pure_masked_text:
                _batched_masked_text(
                    req, registry, sink=writer, chunk_iter=chunk_iter,
                    dissolve_k=vcfg.interpolation_frames,
                )
            else:
                _batched_style(
                    None, req, inputs, registry,
                    sink=writer, chunk_iter=chunk_iter,
                    dissolve_k=vcfg.interpolation_frames,
                    styles=mix_styles if pure_mixing else None,
                    depth=pure_depth,
                )
        finally:
            writer.close()
            chunks.close()
        _note_degraded(req, metrics)
        return out_path

    # General effect chains: STREAMING too — decode-ahead chunks (constant
    # host memory in video length, same contract as the fast paths) ->
    # device programs -> on-device per-chunk cross-dissolve -> ordered
    # fetch workers -> streaming encode. Batch-safe chains (grayscale /
    # pixel art / color palette; _is_batchable_chain) send the whole
    # (B, H, W, 3) chunk through ONE apply_image program with per-image
    # semantics; chains with per-frame host stages (text masks, Gatys,
    # depth) run frame-at-a-time but still stream. Replaces the old
    # full-video read_frames buffer (the reference buffers per-frame temp
    # JPGs, app.py:784-815).
    batchable = _is_batchable_chain(req)
    k = vcfg.interpolation_frames
    bsz = max(1, vcfg.frame_batch)
    chunks = _Prefetch(read_frame_chunks(video_path, bsz, max_frames))
    first = next(chunks, None)
    if first is None:
        chunks.close()
        return None
    import itertools

    chunk_iter = itertools.chain([first], chunks)
    writer = _StreamWriter(out_path, new_fps)
    fetches = _FetchPipeline(writer)
    done = False
    prev = None
    try:
        for i, raw in enumerate(chunk_iter):
            pad = 0
            if batchable:
                # pad the host chunk (repeat last frame) so every chunk
                # compiles ONE chain program shape — a short tail chunk
                # would otherwise recompile the whole chain on axon
                raw, pad = _pad_chunk(raw, bsz, 1, first=i == 0)
                x = jnp.asarray(raw).astype(jnp.float32) / 255.0
                out = pipe.apply_image(x, req, inputs, registry, metrics)
                if out is None:
                    return None
                res = _u8_chunk(out)
            else:
                outs_dev = []
                for f in raw:
                    x = jnp.asarray(f)[None].astype(jnp.float32) / 255.0
                    out = pipe.apply_image(x, req, inputs, registry, metrics)
                    if out is None:
                        return None
                    outs_dev.append(_u8_chunk(out))
                res = (
                    jnp.concatenate(outs_dev, 0)
                    if len(outs_dev) > 1
                    else outs_dev[0]
                )
                if k and i > 0 and res.shape[0] < bsz:
                    # pad the RESULT on device (dup last frame) so the
                    # dissolve keeps one compiled shape; per-frame chain
                    # programs are (1, H, W, 3) regardless, so unlike the
                    # batchable path nothing is wasted processing pads
                    pad = bsz - res.shape[0]
                    res = jnp.concatenate(
                        [res, jnp.repeat(res[-1:], pad, 0)], 0
                    )
            if k:
                res, prev = _dissolve_step(prev, res, k, pad, i == 0)
            elif pad:
                res = res[: res.shape[0] - pad]
            fetches.submit(res)
            logger.info("video: dispatched chunk %d (%d frames)", i, res.shape[0])
        done = True
    finally:
        fetches.close()
        writer.close()
        chunks.close()
        if not done and os.path.exists(out_path):
            os.remove(out_path)  # never leave a partial mp4 behind

    _note_degraded(req, metrics)
    return out_path


def _note_degraded(req: EffectRequest, metrics: Optional[RunMetrics]) -> None:
    if metrics is None:
        return
    from tbist_tpu.utils import degraded as _degraded

    flags = _degraded.flags_for(pipe.needed_components(req))
    if flags:
        metrics.degraded = sorted(set(metrics.degraded) | set(flags))


def _batched_style(
    frames: Optional[List[np.ndarray]],
    req: EffectRequest,
    inputs: pipe.EffectInputs,
    registry: Optional[pipe.ModelRegistry],
    sink=None,
    chunk_iter=None,
    dissolve_k: int = 0,
    styles: Optional[Tuple] = None,
    depth: bool = False,
) -> Optional[List[np.ndarray]]:
    """dp-batched Gatys stylization of video frames (parallel.batched).

    On >1 device the PRODUCTION path shards here: frames over the mesh's
    dp axis (dp-ONLY — every device on dp, sp fixed at 1; see
    production_mesh for why sp drifts the L-BFGS trajectory), VGG weights
    and the style image(s) replicated — replacing the reference's
    sequential one-device frame loop (app.py:784-815). Short chunks pad
    (repeat last frame) to a dp multiple so the compiled program tiles
    evenly.

    ``styles``: explicit style image tuple; None uses
    ``(inputs.style_image,)``. TWO styles run two-style mixing with
    ``cfg.style_img_weight`` — the batched target gram is FEATURE-space
    mixed, matching the image path (reference StyleMixer.py:25-38 via
    app.py:472-590).

    ``chunk_iter``: optional iterator of uint8 RGB chunks replacing
    ``frames`` (streaming decode — constant host memory).

    ``depth``: depth-loss mode (reference app.py:660-735 over video) —
    per-chunk depth targets come from ONE batched estimator program and
    the in-graph depth term joins the per-frame loss (batched.run's
    ``depth_fn``; same objective as optimize.gatys_depth)."""
    import itertools

    from tbist_tpu.parallel import batched, mesh as mesh_lib
    from tbist_tpu.weights import vgg as vgg_weights

    registry = (registry or pipe.ModelRegistry())
    vgg_params = registry.vgg_params or vgg_weights.get_params()
    cfg = req.gatys
    depth_fn = None
    if depth:
        import dataclasses

        from tbist_tpu.effects import depth as depth_fx

        cfg = dataclasses.replace(cfg, w_depth=req.depth.w_depth)
        depth_fn = registry.depth_estimator or depth_fx.default_depth_estimator()

    if chunk_iter is not None:
        chunk_iter = iter(chunk_iter)
        first = next(chunk_iter, None)
        if first is None:
            return None if sink is not None else []
        h, w = first.shape[1:3]
        chunk_iter = itertools.chain([first], chunk_iter)
    else:
        h, w = frames[0].shape[:2]
    bh, bw = bucket_shape(h, w, cfg.shape_bucket, cfg.max_side)

    def _bucket_style(s):
        sh, sw = bucket_shape(s.shape[1], s.shape[2], cfg.shape_bucket, cfg.max_side)
        if (sh, sw) != (s.shape[1], s.shape[2]):
            s = jax.image.resize(s, (1, sh, sw, 3), "bilinear")
        return s

    styles = styles if styles is not None else (inputs.style_image,)
    styles = tuple(_bucket_style(s) for s in styles)

    mesh = mesh_lib.production_mesh(dp_only=True)
    dp = mesh.shape[mesh_lib.DP_AXIS] if mesh is not None else 1
    if mesh is not None:
        vgg_params = jax.device_put(vgg_params, mesh_lib.replicated(mesh))
        styles = tuple(
            jax.device_put(s, mesh_lib.replicated(mesh)) for s in styles
        )
        logger.info("video: sharding frames over mesh dp=%d (dp-only)", dp)

    bsz = _chunk_size(req.video.frame_batch, dp)
    if chunk_iter is None:
        # host uint8; upload per chunk, cast on device
        chunk_iter = _iter_chunks(np.stack(frames), bsz)
    outs: List[np.ndarray] = []
    emit = sink if sink is not None else (lambda arr: outs.extend(arr))
    fetches = _FetchPipeline(emit)  # see _batched_text_transfer
    prev = None
    try:
        for i, raw in enumerate(chunk_iter):
            chunk, pad = _pad_chunk(raw, bsz, dp, first=i == 0)
            x = _upload(chunk, mesh).astype(jnp.float32) / 255.0
            if (bh, bw) != (h, w):
                x = jax.image.resize(x, (x.shape[0], bh, bw, 3), "bilinear")
            res = batched.run(cfg, vgg_params, x, styles, depth_fn=depth_fn)
            if (bh, bw) != (h, w):
                res = jax.image.resize(res, (res.shape[0], h, w, 3), "bilinear")
            res = _u8_device(res)
            if dissolve_k:
                res, prev = _dissolve_step(prev, res, dissolve_k, pad, i == 0)
            elif pad:
                res = res[:-pad]
            fetches.submit(res)
            logger.info(
                "video: dispatched chunk %d (%d frames)", i, res.shape[0]
            )
    finally:
        fetches.close()
    return None if sink is not None else outs
