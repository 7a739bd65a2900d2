"""Disk cache for seeded-init param pytrees.

The reference loads every model from a ``.pth`` on disk at startup
(README.md:28-46, printed at app.py:78). Without checkpoints this
framework falls back to deterministic seeded init — but materializing a
seeded model is dozens of small RNG programs, each separately compiled
(~15-20 s per model family through the axon remote compiler, measured in
benchmarks/results.json ``model_load_s``). Since seeded init is
deterministic, the arrays themselves are cacheable: the first process
writes them to ``weights_cache/<name>.npz`` and every later process
startup loads from disk — the exact load-from-disk shape the reference
has.

Two axon-tunnel facts shape the implementation (measured 2026-08-17):

- Fetching the freshly-initialized leaves back from the TPU for the
  first cache write is catastrophically slow — ``jax.device_get`` of 94
  leaves / 8.9 MB took 425 s (per-leaf round-trip latency dominates).
- JAX's default threefry PRNG is bit-identical across backends, so the
  cache is built by running ``init_fn`` on the **CPU backend** instead:
  same arrays, zero tunnel traffic (``np.asarray`` of a CPU-committed
  leaf is free), then one batched ``device_put`` upload. (The raw
  ``random.bits`` streams are verified identical; ``random.normal``'s
  ``erf_inv`` differs by ~3e-5 between CPU and TPU, so cached seeded
  weights are the CPU-transform values — irrelevant for placeholder
  init, and exactly what the CPU-run golden/CI suite uses.)

Structure comes from ``jax.eval_shape(init_fn)`` (free — no compute), so
a stale cache whose leaf shapes/dtypes no longer match the current model
definition is ignored and rebuilt. ``TBIST_SEED_CACHE=0`` disables the
cache entirely (every process re-inits on the default backend).
"""

from __future__ import annotations

import os
import tempfile
from typing import Any, Callable

import numpy as np

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "weights_cache",
)


def _default_device():
    import jax

    return jax.devices()[0]


def cached_seeded_init(name: str, init_fn: Callable[[], Any]) -> Any:
    """Return ``init_fn()``'s pytree, loading/storing a disk cache.

    ``name`` must uniquely identify the model family AND seed (e.g.
    ``"vgg19_seeded_s0"``); the leaves are stored by flattened index with
    the treedef re-derived from ``jax.eval_shape``. The returned leaves
    are committed to the default device.
    """
    import jax

    if os.environ.get("TBIST_SEED_CACHE", "1") == "0":
        return init_fn()

    shape_tree = jax.eval_shape(init_fn)
    expected = jax.tree.leaves(shape_tree)
    treedef = jax.tree.structure(shape_tree)

    path = os.path.join(_CACHE_DIR, f"{name}.npz")
    if os.path.exists(path):
        try:
            data = np.load(path)
            leaves = [data[str(i)] for i in range(treedef.num_leaves)]
        except Exception:
            leaves = None
        if leaves is not None and all(
            l.shape == e.shape and l.dtype == e.dtype
            for l, e in zip(leaves, expected)
        ):
            # one batched upload: device_put of the list pipelines the
            # transfers (per-leaf jnp.asarray pays a round trip each)
            dev = _default_device()
            up = jax.device_put(leaves, [dev] * len(leaves))
            return jax.tree.unflatten(treedef, up)
        # shape/dtype drift: the model definition changed — rebuild

    # Cache miss: build on the CPU backend (threefry is bit-identical
    # across backends) so the cache write never touches the tunnel.
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except Exception:
        cpu = None
    if cpu is None:
        return init_fn()  # no CPU backend: skip caching entirely

    with jax.default_device(cpu):
        params = init_fn()
    host_leaves = [np.asarray(l) for l in jax.tree.leaves(params)]
    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        flat = {str(i): leaf for i, leaf in enumerate(host_leaves)}
        # atomic write: concurrent first-starts must not read a torn file
        fd, tmp = tempfile.mkstemp(dir=_CACHE_DIR, suffix=".npz.tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                np.savez(f, **flat)
            os.replace(tmp, path)
        except BaseException:
            os.unlink(tmp)
            raise
    except OSError:
        pass  # read-only filesystem etc. — cache is best-effort
    dev = _default_device()
    up = jax.device_put(host_leaves, [dev] * len(host_leaves))
    return jax.tree.unflatten(treedef, up)
