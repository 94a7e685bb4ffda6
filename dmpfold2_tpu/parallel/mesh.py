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


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host startup: call once per host before building meshes.

    Thin wrapper over ``jax.distributed.initialize`` (auto-detects cluster
    env on TPU pods; explicit args for manual launch). After this,
    ``jax.devices()`` spans the slice and :func:`make_mesh` builds a global
    mesh — DCN carries the cross-host target stream, ICI the collectives.
    """
    kwargs = {}
    if coordinator is not None:
        kwargs = {
            "coordinator_address": coordinator,
            "num_processes": num_processes,
            "process_id": process_id,
        }
    jax.distributed.initialize(**kwargs)


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
