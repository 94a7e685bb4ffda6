"""Sequence-parallel sharding constraints for the pair trunk.

The model code stays sharding-agnostic: compute functions call
:func:`shard_pair` / :func:`shard_rows` on their big intermediates, which are
no-ops unless a sharding context is active. Activating
:func:`pair_sharding` makes the O(L²·C) pair tensors shard over the mesh's
``seq`` axis — XLA then partitions the 5×5 convs with automatic halo
exchange, which is the context-parallel analog for this architecture
(SURVEY §2.4, §5 long-target plan).

Under ``jax.vmap(..., spmd_axis_name="data")`` the constraints compose with
data parallelism (the batch dim picks up the ``data`` axis).
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

import jax
from jax.sharding import PartitionSpec as P

_state = threading.local()


def _active_spec():
    return getattr(_state, "spec", None)


@contextmanager
def pair_sharding(axis_name: str = "seq"):
    """Enable sharding of pair tensors' first (residue-row) dim over ``axis_name``."""
    prev = _active_spec()
    _state.spec = axis_name
    try:
        yield
    finally:
        _state.spec = prev


def shard_pair(x):
    """Constrain an (..., L, L, C) pair tensor: rows over the seq axis."""
    axis = _active_spec()
    if axis is None:
        return x
    spec = P(*([None] * (x.ndim - 3)), axis, None, None)
    return jax.lax.with_sharding_constraint(x, spec)


def shard_rows(x):
    """Constrain an (N, ...) row-major tensor (e.g. MSA one-hot) over the seq axis."""
    axis = _active_spec()
    if axis is None:
        return x
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, spec)
