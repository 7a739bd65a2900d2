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


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
