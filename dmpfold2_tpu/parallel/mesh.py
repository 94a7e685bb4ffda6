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
    if n_data < 1 or n_seq < 1 or n_data * n_seq > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_seq} needs {max(n_data, 1) * max(n_seq, 1)} "
            f"devices but only {len(devices)} are available")
    grid = np.asarray(devices[: n_data * n_seq]).reshape(n_data, n_seq)
    return Mesh(grid, ("data", "seq"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def put_global(x, sharding: NamedSharding):
    """Place a host array (or pytree) onto a sharding, multi-process safe.

    Single-process: plain ``jax.device_put``. Multi-process (``jax.distributed``
    initialized, mesh spanning processes): every process holds the same global
    host value and contributes only the shards its local devices own
    (``jax.make_array_from_callback``) — ``device_put`` of a host array onto a
    non-fully-addressable sharding is invalid, which is why the round-1
    docstring-only path could never work on a pod slice.
    """
    if jax.process_count() == 1:
        return jax.tree.map(lambda a: jax.device_put(a, sharding), x)

    def put_one(a):
        a = np.asarray(a)
        return jax.make_array_from_callback(a.shape, sharding, lambda idx: a[idx])

    return jax.tree.map(put_one, x)


def owned_batch_indices(sharding: NamedSharding, shape: tuple) -> set[int]:
    """Batch (dim-0) indices whose shards live on this process's devices."""
    owned: set[int] = set()
    for dev, idx in sharding.devices_indices_map(tuple(shape)).items():
        if dev.process_index != jax.process_index():
            continue
        sl = idx[0] if idx else slice(None)
        start = sl.start or 0
        stop = sl.stop if sl.stop is not None else shape[0]
        owned.update(range(start, stop))
    return owned


_REPLICATE_CACHE: dict = {}


def replicate_result(mesh: Mesh, tree):
    """All-gather a sharded result so every process can fetch it.

    Under multi-process JAX, ``device_get`` of a data-sharded output raises
    (non-addressable shards); re-jitting an identity with replicated
    out_shardings makes XLA all-gather the (small) results over ICI, after
    which every host holds the full arrays. No-op cost single-process.

    The jitted identity is cached per mesh — the pjit cache keys on function
    identity, so a fresh lambda per call would retrace (and remote-compile)
    the all-gather for every retired batch of the hot fold loop.
    """
    fn = _REPLICATE_CACHE.get(mesh)
    if fn is None:
        fn = jax.jit(lambda t: t, out_shardings=replicated(mesh))
        _REPLICATE_CACHE[mesh] = fn
    return fn(tree)
