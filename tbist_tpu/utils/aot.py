"""AOT executable cache: skip the remote XLA compile on cold one-shot runs.

The reference's basic usage shape is ONE request through ``app.py``
(/root/reference/app.py:50-78,372-470) — a cold process. Under axon the
first Gatys dispatch pays the full remote compile (~30 s at 512px), which
dwarfs the 2.4 s warm optimization. ``serve.py --warmup-programs`` solves
the server case; this module covers the CLI one-shot: persist the
compiled executable with ``jax.experimental.serialize_executable`` in
``weights_cache/aot/`` keyed by (jax version, device kind, device count,
program name, static config, arg shapes/dtypes), and on the next cold
start ``deserialize_and_load`` instead of compiling.

This is a different mechanism from ``jax_compilation_cache_dir`` (which
hangs under axon remote compile — CLAUDE.md): serialization happens
client-side on an already-compiled executable, and loading bypasses the
compile RPC entirely.

Opt-in via ``TBIST_AOT_CACHE=1`` (the serialized blob pins shapes AND
toolchain: any mismatch falls back to the normal jit path silently).
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Callable

import jax

from tbist_tpu.utils.logging import logger

_SENTINEL = object()
# process-local handle cache so repeated calls in one process don't re-read
_LOADED: dict[str, Any] = {}


def enabled() -> bool:
    return os.environ.get("TBIST_AOT_CACHE", "0") == "1"


def cache_dir() -> str:
    return os.environ.get(
        "TBIST_AOT_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "weights_cache", "aot"),
    )


def _cache_key(name: str, static_repr: str, dyn_args: tuple) -> str:
    dev = jax.devices()[0]
    parts = [
        jax.__version__, dev.platform, getattr(dev, "device_kind", "?"),
        str(jax.device_count()), name, static_repr,
    ]
    for leaf in jax.tree_util.tree_leaves(dyn_args):
        parts.append(f"{getattr(leaf, 'shape', ())}:{getattr(leaf, 'dtype', type(leaf).__name__)}")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:32]


def call_cached(
    jitted: Callable,
    name: str,
    static_repr: str,
    static_args: tuple,
    dyn_args: tuple,
):
    """Run ``jitted(*static_args, *dyn_args)`` through the AOT cache.

    ``jitted`` must be a ``jax.jit`` wrapper whose static args lead the
    signature (``static_argnames`` matching ``static_args``). On a cache
    hit the executable is deserialized and called without any compile
    RPC; on a miss it is lowered+compiled, persisted, then called. ANY
    failure (pickle version skew, backend refusal, signature drift)
    falls back to the ordinary jit call — the cache can only ever be a
    no-op, never an error.
    """
    key = _cache_key(name, static_repr, dyn_args)
    loaded = _LOADED.get(key, _SENTINEL)
    if loaded is _SENTINEL:
        path = os.path.join(cache_dir(), f"{name}-{key}.jaxexec"
                            )
        loaded = None
        if os.path.exists(path):
            try:
                from jax.experimental import serialize_executable as se

                with open(path, "rb") as fh:
                    loaded = se.deserialize_and_load(*pickle.load(fh))
                logger.info("aot: loaded %s from %s", name, path)
            except Exception as exc:  # corrupted / version skew
                logger.warning("aot: load failed (%s); recompiling", exc)
                loaded = None
        if loaded is None:
            try:
                from jax.experimental import serialize_executable as se

                compiled = jitted.lower(*static_args, *dyn_args).compile()
                os.makedirs(cache_dir(), exist_ok=True)
                tmp = path + ".tmp"
                with open(tmp, "wb") as fh:
                    pickle.dump(se.serialize(compiled), fh)
                os.replace(tmp, path)
                logger.info("aot: compiled + saved %s (%d KB)",
                            name, os.path.getsize(path) // 1024)
                loaded = compiled
            except Exception as exc:
                logger.warning("aot: serialize failed (%s); plain jit", exc)
                _LOADED[key] = None
                return jitted(*static_args, *dyn_args)
        _LOADED[key] = loaded
    if loaded is None:  # earlier failure this process
        return jitted(*static_args, *dyn_args)
    try:
        return loaded(*dyn_args)
    except Exception as exc:
        logger.warning("aot: cached executable rejected args (%s); plain jit",
                       exc)
        _LOADED[key] = None
        return jitted(*static_args, *dyn_args)
