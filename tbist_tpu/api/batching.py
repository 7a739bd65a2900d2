"""Cross-request micro-batching for the feed-forward text-style path.

The reference is a single-user Gradio app: every request runs alone and
torch-eager (app.py:116-740, text/FastTextTransfer.py:36-66). In
production serving, the dominant cheap request — a feed-forward Ghiasi
stylization driven only by a text style prompt — is embarrassingly
batchable on a TPU: both sub-networks are batch-first, so N concurrent
requests of the same image shape become ONE MXU-dense program instead of
N sequential dispatches (each of which leaves the 128×128 systolic array
mostly idle at batch 1).

This module is the queueing layer: server threads ``submit()`` their
(image, prompt) and block; a single daemon worker drains the queue into
shape-grouped batches within a short window and answers up to
``max_batch`` requests with one ``perform_transfer_batch`` call.
Batching changes scheduling only — outputs equal the sequential path
(tests/test_batching.py asserts it).
"""

from __future__ import annotations

import queue
import threading
import time
import weakref
from typing import List, Optional

import numpy as np

from tbist_tpu.utils.config import EffectRequest

# every live batcher, so tests/process shutdown can stop worker threads
# without tracking instances at each construction site
_LIVE: "weakref.WeakSet" = weakref.WeakSet()


def close_all() -> None:
    """Stop every live batcher's worker thread (used by test teardown)."""
    for b in list(_LIVE):
        b.close()


def eligible(req: EffectRequest) -> bool:
    """True iff the request is exactly a feed-forward text stylization.

    Conservative: any other stage (masks, pixel art, optimization
    transfer, palette, depth, grayscale) routes to the general pipeline.
    """
    t = req.text
    return (
        t is not None
        and bool(t.style_prompt)
        and not t.location_prompt
        and not t.texture_prompt
        and not req.grayscale
        and req.pixel_art is None
        and not req.style_transfer
        and not req.style_mixing
        and not req.color_palette
        and req.depth is None
    )


def dispatch_fast_text_batch(
    images: List[np.ndarray], prompts: List[str], quantize_uint8: bool = False
):
    """Stack host images and dispatch ONE batched fast-text program.

    The exact device-program sequence the batcher runs per batch: uint8
    host rows stay uint8 through the upload and are cast on device
    (f32 rows upload as-is); ``perform_transfer_batch`` pads/shards and
    runs the main program; ``quantize_uint8`` quantizes the result on
    device. Returns the UNFETCHED device array so the caller controls
    where the device lock ends and the host fetch begins.

    The serve warmup calls this too, so precompilation covers precisely
    the programs traffic will hit — including the per-arrival-size
    stack/cast/pad/slice epilogues, each of which otherwise pays a
    multi-second axon remote compile on first traffic (measured: a
    first 3-request burst took 16.7 s with the b4 MAIN already warm,
    vs 1.9 s once the epilogues had compiled).
    """
    import jax.numpy as jnp

    from tbist_tpu.effects import text_transfer as tt

    x = jnp.asarray(np.stack(images))
    if x.dtype == jnp.uint8:  # upload was 4x lighter; cast on device
        x = x.astype(jnp.float32) / 255.0
    out = tt.perform_transfer_batch(x, list(prompts))
    if quantize_uint8:  # quantize on device, fetch uint8
        from tbist_tpu.utils.imageio import to_uint8_device

        out = to_uint8_device(out)
    return out


class _Item:
    __slots__ = ("image", "prompt", "event", "result", "error", "batch_n")

    def __init__(self, image: np.ndarray, prompt: str):
        self.image = image  # (H, W, 3) float32 in [0, 1] or uint8
        self.prompt = prompt
        self.event = threading.Event()
        self.result: Optional[np.ndarray] = None
        self.error: Optional[BaseException] = None
        self.batch_n = 0


class FastTextBatcher:
    """Coalesce concurrent fast-text requests into batched device calls.

    Parameters
    ----------
    max_batch: largest batch per device program (padded to a power of
        two inside ``perform_transfer_batch``, so the jit cache stays
        small).
    window_ms: how long the worker waits for companions after the first
        request arrives. A few ms — less than one 512px forward — so a
        lone request pays almost nothing and a burst coalesces.
    quantize_uint8: return uint8 results quantized ON DEVICE
        (clip(round(x*255)), to_uint8 semantics). The serve layer re-encodes
        to PNG anyway, and fetching uint8 moves 4x fewer bytes through the
        ~31 MB/s axon host link than f32 — with quantization the fetch no
        longer dominates the 21 ms fast-text forward.
    """

    def __init__(
        self,
        max_batch: int = 8,
        window_ms: float = 4.0,
        device_lock: Optional[threading.Lock] = None,
        quantize_uint8: bool = False,
    ):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self.max_batch = int(max_batch)
        self.window_s = float(window_ms) / 1e3
        self.quantize_uint8 = bool(quantize_uint8)
        # serve passes its request lock so batched programs still
        # serialize against non-batched pipeline work on the device
        self._device_lock = device_lock
        self._q: "queue.Queue[_Item]" = queue.Queue()
        self._lock = threading.Lock()
        self._worker: Optional[threading.Thread] = None
        # observability (read by tests and the serve layer)
        self.batches_run = 0
        self.requests_served = 0
        self._batch_sizes: List[int] = []
        self._closed = False
        _LIVE.add(self)

    # -- public -----------------------------------------------------------

    def submit(self, image: np.ndarray, prompt: str) -> np.ndarray:
        """Block until the batched result for this request is ready.

        ``image`` is host (H, W, 3) float32 in [0, 1], or uint8 (kept
        uint8 through the upload — 4x fewer bytes, cast on device);
        returns the stylized (H, W, 3) float32 array (uint8 when
        ``quantize_uint8``).
        """
        return self.submit_item(image, prompt).result

    def submit_item(self, image: np.ndarray, prompt: str) -> _Item:
        """Like :meth:`submit` but returns the completed queue item,
        exposing ``batch_n`` (how many requests shared the program)."""
        if self._closed:
            raise RuntimeError("batcher is closed")
        image = np.asarray(image)
        if image.ndim != 3 or image.shape[-1] != 3:
            raise ValueError(f"expected (H, W, 3) image, got {image.shape}")
        if image.dtype != np.uint8:
            image = image.astype(np.float32)
        self._ensure_worker()
        item = _Item(image, prompt)
        self._q.put(item)
        item.event.wait()
        if item.error is not None:
            # one exception object is shared by every waiter of a failed
            # batch; raise a shallow copy so concurrent raises don't race
            # on the shared instance's __traceback__
            import copy

            raise copy.copy(item.error) from item.error
        return item

    @property
    def last_batch_sizes(self) -> List[int]:
        return list(self._batch_sizes)

    def close(self, timeout: float = 2.0) -> None:
        """Stop the worker thread. Queued work drains first; idempotent.

        The worker is a daemon, so a process exit never hangs on it —
        close() exists for long-lived processes (serve shutdown) and for
        test hygiene: hundreds of parked drain threads otherwise
        accumulate across a large suite run.
        """
        with self._lock:
            self._closed = True
            worker = self._worker
        if worker is not None and worker.is_alive():
            self._q.put(None)  # sentinel: wake the blocking drain
            worker.join(timeout)

    # -- worker -----------------------------------------------------------

    def _ensure_worker(self) -> None:
        with self._lock:
            if self._worker is None or not self._worker.is_alive():
                self._worker = threading.Thread(
                    target=self._run, name="fast-text-batcher", daemon=True
                )
                self._worker.start()

    def _drain(self) -> List[_Item]:
        """One blocking get, then gather companions inside the window.

        A ``None`` sentinel (pushed by :meth:`close`) is filtered out;
        real items queued before the close still drain and get answered.
        """
        first = self._q.get()
        group = [first]
        deadline = time.monotonic() + self.window_s
        while len(group) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                group.append(self._q.get(timeout=remaining))
            except queue.Empty:
                break
        return [g for g in group if g is not None]

    def _run(self) -> None:
        while True:
            # a sentinel consumed alongside real items is filtered by
            # _drain, so re-check here before blocking on the queue again
            if self._closed and self._q.empty():
                return
            group = self._drain()
            if not group:
                if self._closed:
                    return
                continue
            # partition by exact image shape AND dtype — only those share
            # a program (np.stack over mixed f32/uint8 would promote the
            # 0-255 uint8 rows to float alongside 0-1 rows)
            by_shape: dict = {}
            for it in group:
                by_shape.setdefault(
                    (it.image.shape, it.image.dtype.str), []
                ).append(it)
            for items in by_shape.values():
                self._run_batch(items)

    def _run_batch(self, items: List[_Item]) -> None:
        try:
            import contextlib

            guard = self._device_lock or contextlib.nullcontext()
            with guard:  # dispatch under the lock; fetch OUTSIDE it —
                # np.asarray only waits/copies and needs no device-lock
                # protection, so a ~200 ms batch-8 fetch through the axon
                # link must not stall non-batched pipeline requests
                out = dispatch_fast_text_batch(
                    [it.image for it in items],
                    [it.prompt for it in items],
                    self.quantize_uint8,
                )
            out_np = np.asarray(out)
            self.batches_run += 1
            self.requests_served += len(items)
            self._batch_sizes.append(len(items))
            if len(self._batch_sizes) > 1024:  # bounded history on a
                del self._batch_sizes[:-256]  # long-lived server
            for i, it in enumerate(items):
                it.result = out_np[i]
                it.batch_n = len(items)
        except BaseException as e:  # propagate to every waiter
            for it in items:
                it.error = e
        finally:
            for it in items:
                it.event.set()
