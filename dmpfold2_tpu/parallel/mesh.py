"""Device mesh construction for data ('data') and sequence ('seq') parallelism.

The reference is strictly single-device (SURVEY §2.4: no torch.distributed at
all), so every axis here is net-new design:

  * ``data``  — independent targets streamed data-parallel (weights replicated).
  * ``seq``   — within-target sharding of the O(L²) pair tensors for long
                targets, and of MSA rows during feature construction.

Collectives ride ICI via GSPMD: we only annotate shardings; XLA inserts
psum/all-gather/halo exchanges.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_seq: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_seq
    if n_data * n_seq > len(devices):
        raise ValueError(f"mesh {n_data}x{n_seq} needs more than {len(devices)} devices")
    grid = np.asarray(devices[: n_data * n_seq]).reshape(n_data, n_seq)
    return Mesh(grid, ("data", "seq"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))
