"""Sequence-parallel sharding constraints for the pair trunk.

The model code stays sharding-agnostic: compute functions call
:func:`shard_pair` / :func:`shard_rows` on their big intermediates. The
constraints activate automatically whenever the ambient mesh (``jax.set_mesh``)
has a non-trivial ``seq`` axis in Auto mode — the O(L²·C) pair tensors then
shard over it and XLA partitions the 5×5 convs with automatic halo exchange,
the context-parallel analog for this architecture (SURVEY §2.4, §5
long-target plan).

Deriving activation from the ambient mesh (instead of a thread-local opt-in
flag) matters for correctness, not just convenience: the mesh context is
part of jit's cache key, so a program traced without the mesh can never be
reused for a sharded call — a Python-level flag would be invisible to the
cache and silently serve stale unsharded executables. It also works from any
thread (serving dispatchers). Inside ``shard_map`` bodies the mesh axes are
Manual, so the constraints correctly stay off there.

:func:`pair_sharding` remains as an explicit override — ``pair_sharding("seq")``
forces the axis name, ``pair_sharding(None)`` disables constraints under a
seq mesh. It must always be used together with the matching ``jax.set_mesh``
context (entering the mesh context is what keys the jit cache).

Under ``jax.vmap(..., spmd_axis_name="data")`` the constraints compose with
data parallelism (the batch dim picks up the ``data`` axis).
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

import jax
from jax.sharding import PartitionSpec as P

_state = threading.local()
_UNSET = object()


def _active_spec():
    explicit = getattr(_state, "spec", _UNSET)
    if explicit is not _UNSET:
        return explicit
    mesh = jax.sharding.get_abstract_mesh()
    if mesh.empty:
        return None
    if mesh.shape.get("seq", 1) > 1 and "seq" in mesh.auto_axes:
        return "seq"
    return None


@contextmanager
def pair_sharding(axis_name: str | None = "seq"):
    """Override pair-tensor sharding: force ``axis_name``, or None to disable.

    Only needed to deviate from the mesh-derived default (see module
    docstring); always pair with the matching ``jax.set_mesh`` context.
    """
    prev = getattr(_state, "spec", _UNSET)
    _state.spec = axis_name
    try:
        yield
    finally:
        if prev is _UNSET:
            del _state.spec
        else:
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
