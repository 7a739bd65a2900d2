"""Device mesh and sharding policy.

The reference has no parallelism at all — one global device string
(app.py:51) and a sequential per-frame video loop (app.py:784-815). This
module is the deliberately new TPU-native component (SURVEY §5): a 2-D
``(dp, sp)`` mesh where

* ``dp`` (data parallel) shards the frame/batch axis of video stylization —
  frames are independent given fixed prompts (SURVEY §3.5), the canonical
  batch axis;
* ``sp`` (spatial parallel) shards the image width axis — XLA GSPMD
  partitions convolutions spatially with automatic halo exchange, so large
  single images scale across chips over ICI.

VGG/Ghiasi weights are small (<600 MB total) and replicated; collectives
(psums from gram/loss reductions, conv halos) are inserted by XLA from the
NamedSharding annotations.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
SP_AXIS = "sp"


def _factor(n: int) -> Tuple[int, int]:
    """Split n into (dp, sp) with sp as large a power-of-two factor ≤ 4."""
    for sp in (4, 2, 1):
        if n % sp == 0:
            return n // sp, sp
    return n, 1


def make_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    dp: Optional[int] = None,
    sp: Optional[int] = None,
) -> Mesh:
    """Create a (dp, sp) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if dp is None or sp is None:
        dp, sp = _factor(n_devices)
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, (DP_AXIS, SP_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC image batch: batch over dp, width over sp."""
    return NamedSharding(mesh, P(DP_AXIS, None, SP_AXIS, None))


def mask_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W) mask batch: batch over dp (the masked-text video lane's
    per-frame location masks)."""
    return NamedSharding(mesh, P(DP_AXIS, None, SP_AXIS))


def single_image_sharding(mesh: Mesh) -> NamedSharding:
    """(1, H, W, C) single image: width over sp — XLA GSPMD partitions
    the convolutions spatially with automatic halo exchange, and inserts
    the cross-shard psums for instance-norm statistics. The layout that
    makes ONE large image scale across a slice (the reference's single
    global device, app.py:51, has no analog)."""
    return NamedSharding(mesh, P(None, None, SP_AXIS, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def production_mesh(dp_only: bool = False, sp_only: bool = False) -> Optional[Mesh]:
    """The mesh the PRODUCT runs on: over every visible device, or None
    single-device (where sharding is pure overhead).

    This is what video/video.py builds per request — on a real multi-chip
    slice frames shard over dp without any user configuration, replacing
    the reference's sequential single-device frame loop (app.py:784-815).

    ``dp_only`` lays out every device on dp (sp=1). Video batches use it:
    frames are embarrassingly parallel, so dp has zero cross-device
    traffic AND is bit-stable vs the unsharded program — sp splits conv
    reduction order, whose ~1e-3 float drift the chaotic L-BFGS
    trajectory amplifies (measured: dp-only 8e-4 after 2 steps, any
    sp>1 layout 0.3). ``sp_only`` lays every device on sp — the
    single-image layout (B=1 leaves dp nothing to shard; feed-forward
    paths have no L-BFGS chaos, so sp's conv-reduction-order drift stays
    within one uint8 level after quantization). Set TBIST_DISABLE_MESH=1
    to force the single-device path (debugging / A-B timing)."""
    import os

    # "1" enables the override — same convention as every other TBIST_*
    # flag (a plain truthiness test would make =0 disable the mesh too)
    if os.environ.get("TBIST_DISABLE_MESH") == "1":
        return None
    devices = jax.devices()
    if len(devices) < 2:
        return None
    if dp_only:
        return make_mesh(devices=devices, dp=len(devices), sp=1)
    if sp_only:
        return make_mesh(devices=devices, dp=1, sp=len(devices))
    return make_mesh(devices=devices)


def pad_to_multiple(x, m: int):
    """Pad an (B, ...) array's batch to a multiple of m by repeating the
    final element. Returns (padded, pad_count). Sharded program shapes
    must tile evenly over dp; callers slice the pad back off."""
    import jax.numpy as jnp

    b = x.shape[0]
    pad = (-b) % m
    if pad:
        x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
    return x, pad
