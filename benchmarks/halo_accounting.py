"""Halo-exchange accounting for the sp-sharded single-image Gatys lane.

Only one real TPU chip is reachable in this environment, so the ICI cost
of spatial sharding cannot be measured end-to-end. This script produces
the next-best evidence (benchmarks/PROFILE.md round-5a): compile the
EXACT production train step (parallel/batched.train_step, the program
effects/style.py dispatches when the sp lane activates) on a virtual
sp-sharded CPU mesh and read the per-device collective traffic out of the
SPMD-partitioned HLO. Halo bytes scale linearly with the un-sharded image
height, so H is fixed at 256 (keeps CPU compile/exec cheap) and the
report scales to square images analytically.

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/halo_accounting.py
"""

from __future__ import annotations

import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from tbist_tpu.models import vgg19  # noqa: E402
from tbist_tpu.parallel import batched, mesh as mesh_lib  # noqa: E402
from tbist_tpu.utils.config import GatysConfig  # noqa: E402

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "u8": 1, "s32": 4, "u32": 4,
                "pred": 1, "f64": 8, "s64": 8, "u64": 8}
_SHAPE_RE = re.compile(r"(f32|bf16|f16|u8|s32|u32|s64|u64|f64|pred)\[([0-9,]*)\]")


def _op_bytes(line: str) -> int:
    """Bytes of the (first) result shape on an HLO instruction line."""
    m = _SHAPE_RE.search(line)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dt]


def collective_bytes(hlo_text: str) -> dict:
    """Per-device bytes by collective kind in an SPMD module.

    HLO instruction lines read ``%name = TYPE kind(args)`` — the result
    type sits between ``=`` and the op name, so match ``= <type> kind(``.
    """
    out = collections.Counter()
    for line in hlo_text.splitlines():
        ls = line.strip()
        for kind in ("collective-permute", "all-reduce", "all-gather",
                     "reduce-scatter", "all-to-all"):
            # match instructions, not computation names/calls
            if re.search(rf"= \S+ {kind}(?:-start)?\(", ls):
                out[kind] += _op_bytes(ls)
    return dict(out)


def account(width: int, sp: int, h: int = 256) -> dict:
    mesh = mesh_lib.make_mesh(sp, dp=1, sp=sp)
    cfg = GatysConfig(num_steps=1, optimizer="lbfgs", max_side=max(width, 1024))
    frames = jax.device_put(
        jnp.zeros((1, h, width, 3), jnp.float32),
        mesh_lib.single_image_sharding(mesh),
    )
    vp = jax.device_put(vgg19.init_params(jax.random.key(0)),
                        mesh_lib.replicated(mesh))
    style = jax.device_put(jnp.zeros((1, 256, 256, 3), jnp.float32),
                           mesh_lib.replicated(mesh))
    state, cf, tg, sg = batched.init_batch(cfg, vp, frames, (style,))
    txt = (
        batched.train_step.lower(cfg, vp, state, cf, tg, sg)
        .compile()
        .as_text()
    )
    per_dev = collective_bytes(txt)
    total = sum(per_dev.values())
    return {
        "width": width, "height": h, "sp": sp,
        "per_device_bytes_by_kind": per_dev,
        "per_device_total_MB_per_step": round(total / 1e6, 3),
        # halo traffic is proportional to H; scale the H=256 module to the
        # square H=width image the lane actually runs
        "square_image_total_MB_per_step": round(total * width / h / 1e6, 3),
    }


if __name__ == "__main__":
    rows = []
    for width, sp in [(512, 2), (1024, 2), (2048, 2), (512, 8)]:
        r = account(width, sp)
        print(json.dumps(r))
        rows.append(r)
