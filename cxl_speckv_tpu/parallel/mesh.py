"""Device-mesh construction.

The distributed layer is NEW relative to the reference (SURVEY.md section
2.6: no DP/TP/PP/NCCL anywhere in that tree — its only transport is
ioctl->MMIO->FPGA). On TPU the communication backend is XLA itself: a
`jax.sharding.Mesh` over the slice, `NamedSharding` annotations, and the
compiler inserts ICI collectives (the scaling-book recipe).

Axes:
- "dp": data parallel — batch (continuous-batching lanes) sharded across it
- "ep": expert parallel — MoE expert weights/compute sharded across it
  (size 1 for dense models; the axis always exists, so dp/tp specs are
  unchanged either way)
- "tp": tensor parallel — weight columns/rows and KV heads sharded across
  it (innermost = ICI-closest: TP collectives are per-matmul, EP's psum is
  per-MoE-block, DP is per-step)

Multi-host: call `jax.distributed.initialize()` before building the mesh;
`jax.devices()` then spans hosts and the same mesh code yields DCN+ICI
hybrid layouts.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(dp: int = 1, tp: int | None = None, devices=None,
              ep: int = 1) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if tp is None:
        tp = len(devices) // (dp * ep)
    if dp * ep * tp != len(devices):
        raise ValueError(
            f"dp*ep*tp = {dp}*{ep}*{tp} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(dp, ep, tp)
    return Mesh(arr, ("dp", "ep", "tp"))


def single_device_mesh() -> Mesh:
    return make_mesh(dp=1, tp=1, devices=jax.devices()[:1])
