"""Batch folding engine: stream many targets data-parallel across the mesh.

The reference folds one protein per process invocation (predict.py CLI);
throughput ("targets/s on a Pfam batch", BASELINE.json) is a net-new
capability:

  * targets are grouped by (nseqs, nres) shape bucket,
  * each group is packed into fixed-size batches,
  * one jitted program per bucket folds a whole batch with the natively
    batched forward (one trunk conv / GRU matmul per step for the whole
    batch, Pallas kernels on TPU). Under a mesh the same body runs inside
    ``jax.shard_map`` over the ``data`` axis — each device folds its local
    batch shard; mapping the *program* rather than the operator keeps the
    Pallas kernels (which have no GSPMD partitioning rule) on the fast path,
    and per-chip work is independent: no cross-chip traffic except the
    input scatter / output gather,
  * partial batches are padded by repeating the last target and dropped on
    the way out.

Multi-host: after ``jax.distributed.initialize`` (see
``mesh.initialize_distributed``), every process runs the same ``fold_many``
over the same target list with a global mesh. Each process contributes only
the batch shards its local devices own (``mesh.put_global`` /
``jax.make_array_from_callback``); outputs are all-gathered over ICI
(``mesh.replicate_result``) so every host — in particular host 0 — holds
every result. Per-process throughput counters count only locally-computed
targets and are summed with ``Counters.merge`` via ``global_counters()``.
Verified by a real 2-process emulation test (tests/test_multiprocess.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Sequence

import time

import numpy as np
import jax
import jax.numpy as jnp

from ..engine.buckets import bucket_shape
from ..engine.fold import _build_dmap_channel
from .mesh import (data_sharded, owned_batch_indices, put_global, replicated,
                   replicate_result)
from ..features.dca import dca_or_zero
from ..features.msa import msa_one_hot, reweight
from ..models import gruresnet
from ..utils.obs import Counters, log_target


def _fold_batch_local(params, alnmat, nseqs, nres, dmap_channel, nloops,
                      refine_steps, *, dca_method="cholesky", precision="fp32",
                      vgru_impl="scan", fused_conv=False,
                      refine_impl="xla", rgru_impl="scan", mds_impl="eigh"):
    """Batched fold body: (B, N, L) -> ((B, L, 5, 3), (B, L)). Pure function
    of per-device-visible data — used directly under ``jit`` (single device /
    GSPMD) and as the per-shard body under ``shard_map`` (see
    :func:`_fold_batch_shardmap`).

    Always the natively-batched model: one trunk conv per block for the
    whole batch (required by the Pallas fused conv; also batches the GRU
    matmuls over B*L columns). There is deliberately no vmapped per-sample
    fallback here — a second code path with silently different kernel
    selections would violate the shared-implementation policy
    (engine/fold.py resolve_*).

    fp32_strict applies the same fidelity semantics as the single-target
    engine (engine/fold.py:_fold_device): raw LAPACK eigenvector signs and
    full-fp32 matmuls, so batch results match Folder.fold bit-for-bit in
    intent."""
    compute_dtype = jnp.bfloat16 if precision == "bf16" else None
    canonical_signs = precision != "fp32_strict"

    def features(aln, ns, nr, dmap):
        from ..engine.fold import resolve_dca_precision

        oh = msa_one_hot(aln, ns, nr)
        w = reweight(oh, nr)
        dca = dca_or_zero(oh, w, ns, nr, method=dca_method,
                          matmul_precision=resolve_dca_precision(precision))
        return jnp.concatenate([dca, dmap[:, :, None]], axis=2)

    def body():
        x2 = jax.vmap(features)(alnmat, nseqs, nres, dmap_channel)
        return gruresnet.forward_batched(
            params, alnmat, x2, nseqs, nres, nloops, refine_steps,
            compute_dtype=compute_dtype, fused_conv=fused_conv,
            refine_impl=refine_impl, vgru_impl=vgru_impl,
            rgru_impl=rgru_impl, canonical_signs=canonical_signs,
            mds_impl=mds_impl,
        )

    if precision == "fp32_strict":
        with jax.default_matmul_precision("highest"):
            return body()
    return body()


@partial(jax.jit, static_argnames=("dca_method", "precision", "vgru_impl",
                                   "fused_conv", "refine_impl",
                                   "rgru_impl", "mds_impl"))
def _fold_batch(params, alnmat, nseqs, nres, dmap_channel, nloops, refine_steps,
                dca_method="cholesky", precision="fp32", vgru_impl="scan",
                fused_conv=False, refine_impl="xla",
                rgru_impl="scan", mds_impl="eigh"):
    return _fold_batch_local(
        params, alnmat, nseqs, nres, dmap_channel, nloops, refine_steps,
        dca_method=dca_method, precision=precision, vgru_impl=vgru_impl,
        fused_conv=fused_conv,
        refine_impl=refine_impl, rgru_impl=rgru_impl, mds_impl=mds_impl)


_SHARDMAP_CACHE: dict = {}


def _fold_batch_shardmap(mesh, **statics):
    """jitted shard_map fold over the mesh's ``data`` axis.

    Targets are embarrassingly parallel, so instead of relying on GSPMD to
    partition a vmapped program, each device runs the full natively-batched
    fold — Pallas kernels included — on its local batch shard. This is the
    TPU idiom for 'the kernel has no vmap/GSPMD partitioning rule': map the
    *program*, not the operator. Weights and trip counts are replicated
    (in_spec ``P()``), batch-dim inputs and both outputs shard over 'data'.
    No collectives run inside the fold (targets independent); the only
    cross-device traffic is the input scatter / output gather.
    """
    key = (mesh, tuple(sorted(statics.items())))
    fn = _SHARDMAP_CACHE.get(key)
    if fn is None:
        from jax.sharding import PartitionSpec as P

        body = partial(_fold_batch_local, **statics)
        fn = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P("data"), P("data"), P(), P()),
            out_specs=(P("data"), P("data")),
            check_vma=False,
        ))
        _SHARDMAP_CACHE[key] = fn
    return fn


@dataclass
class Target:
    alnmat: np.ndarray
    template_ca: np.ndarray | None = None


class PendingFolds:
    """Handle for an in-flight :meth:`BatchFolder.fold_many_async` call.

    ``wait()`` drives the remaining dispatch/retire pipeline to completion
    and returns the result list (idempotent — later calls return the same
    list)."""

    def __init__(self, wait_fn):
        self._wait_fn = wait_fn
        self._results = None
        self._done = False

    def wait(self):
        if not self._done:
            self._results = self._wait_fn()
            self._done = True
        return self._results


@dataclass
class BatchFolder:
    """Groups targets by bucket and folds them in data-parallel batches."""

    params: dict
    mesh: jax.sharding.Mesh | None = None
    batch_size: int | None = None  # default: number of data-axis shards
    precision: str = "fp32"
    dca_method: str = "auto"  # "lu" | "cholesky" | "schur" | "blocked"
    # "auto": the per-column-valid Pallas kernel serves the WHOLE batch in
    # one invocation on the natively-batched TPU path (columns = B*L).
    # Under a mesh the fold runs via shard_map, so each device still runs
    # the natively-batched program — Pallas kernels included — on its
    # local batch shard.
    vgru_impl: str = "auto"
    verbose: bool = False          # per-target JSON logs (utils.obs)
    counters: Counters = field(default_factory=Counters)

    def _n_data(self) -> int:
        if self.mesh is None:
            return 1
        return self.mesh.shape.get("data", 1)

    # implementation policies shared with the single-target engine
    # (engine/fold.py resolve_*), so batch and requeue paths can never drift

    def _vgru_impl(self) -> str:
        from ..engine.fold import resolve_vgru_impl

        return resolve_vgru_impl(self.vgru_impl)

    def _dca_method(self) -> str:
        from ..engine.fold import resolve_dca_method

        return resolve_dca_method(self.dca_method, self.precision)

    def _fused_conv(self):
        from ..engine.fold import resolve_fused_conv

        return resolve_fused_conv(self.precision)

    def _refine_impl(self) -> str:
        from ..engine.fold import resolve_refine_impl

        return resolve_refine_impl()

    def _rgru_impl(self) -> str:
        from ..engine.fold import resolve_rgru_impl

        return resolve_rgru_impl(self.precision)

    def _mds_impl(self) -> str:
        from ..engine.fold import resolve_mds_impl

        return resolve_mds_impl(self.precision)

    def global_counters(self) -> Counters:
        """Cluster-wide throughput: per-process counters summed across hosts.

        Single-process this is just ``self.counters``; multi-process it
        all-gathers each process's (targets, residues, started) and merges
        with :meth:`Counters.merge`. Collective — every process must call it.
        """
        if jax.process_count() == 1:
            return self.counters
        from jax.experimental import multihost_utils

        local = np.asarray(
            [float(self.counters.targets), float(self.counters.residues),
             self.counters.started], np.float64)
        gathered = np.asarray(multihost_utils.process_allgather(local))
        merged = []
        for targets, residues, started in gathered:
            c = Counters(targets=int(targets), residues=int(residues))
            c.started = float(started)
            merged.append(c)
        return Counters.merge(merged)

    def _fold_single(self, target: Target, iterations: int, minsteps: int):
        from ..engine.fold import Folder

        # forward every impl knob so a requeued target folds with the same
        # numerics (and the same workaround settings) as its batchmates
        folder = Folder(self.params, precision=self.precision,
                        dca_method=self.dca_method, vgru_impl=self.vgru_impl)
        return folder.fold(target.alnmat, target.template_ca, iterations, minsteps)

    # how many batches may be in flight at once: depth 2 overlaps host-side
    # padding + H2D upload of batch k+1 with device compute of batch k (JAX
    # dispatch is async; only the result fetch blocks). Deeper queues buy
    # nothing on one core and hold more input buffers live in HBM.
    max_inflight: int = 2

    def fold_many(self, targets: Sequence[Target], iterations: int = 10,
                  minsteps: int = 100):
        """Fold all targets; returns results in input order as
        [(coords (nres,5,3), confs (nres,))].

        Batches are pipelined: each is dispatched asynchronously and retired
        (fetched) up to ``max_inflight`` batches later, so feature padding
        and input upload for the next batch hide under the device's current
        fold. Multi-process callers stay in lockstep because every process
        walks the same deterministic work list with the same window policy.
        """
        return self.fold_many_async(targets, iterations, minsteps).wait()

    def fold_many_async(self, targets: Sequence[Target], iterations: int = 10,
                        minsteps: int = 100) -> "PendingFolds":
        """Start folding without blocking on results.

        Pads, uploads and launches up to ``max_inflight`` batches (JAX
        dispatch is asynchronous) and returns a :class:`PendingFolds` whose
        ``wait()`` drives the remaining pipeline and returns the result
        list. This is the serving dispatcher's overlap hook: group k+1's
        parse/pad/upload runs while group k is still on device
        (round-4 verdict item 3 — the dispatcher used to serialize groups).
        """
        n_data = max(self._n_data(), 1)
        batch = self.batch_size or n_data
        # the batch dim shards over 'data': keep it a multiple of the axis
        batch = -(-batch // n_data) * n_data

        # group indices by bucket shape
        groups: dict[tuple[int, int], list[int]] = {}
        for i, t in enumerate(targets):
            n_pad, l_pad = bucket_shape(*t.alnmat.shape)
            groups.setdefault((n_pad, l_pad), []).append(i)

        if self.mesh is not None and getattr(self, "_placed_mesh", None) is not self.mesh:
            # replicate weights once per FOLDER (multi-process safe: each
            # host contributes its local devices' copies). Re-placing on
            # every call would round-trip the full ~140 MB tree through the
            # host (np.asarray fetch + re-upload) per fold_many invocation.
            self.params = put_global(self.params, replicated(self.mesh))
            self._placed_mesh = self.mesh

        statics = dict(
            dca_method=self._dca_method(), precision=self.precision,
            vgru_impl=self._vgru_impl(),
            fused_conv=self._fused_conv(),
            refine_impl=self._refine_impl(),
            rgru_impl=self._rgru_impl(),
            mds_impl=self._mds_impl(),
        )
        trip = (jnp.asarray(max(iterations, 0)), jnp.asarray(max(minsteps, 0)))

        # per-process ownership of batch slots (multi-process): every chunk
        # pads to the same batch size, so this is chunk-independent — compute
        # it once so even dispatch-time failures requeue with correct
        # ownership (counters must record each target on exactly one process)
        owned_slots = None
        if self.mesh is not None and jax.process_count() > 1:
            owned_slots = owned_batch_indices(
                data_sharded(self.mesh, 1), (batch,))

        results: list = [None] * len(targets)

        def dispatch(bucket, chunk):
            """Pad + upload one batch and launch the fold (does not block)."""
            n_pad, l_pad = bucket
            # partial chunks pad to the full batch size (shape-stable: one
            # compiled program per bucket; batch is already a data-axis
            # multiple)
            pad_to = batch
            take = list(chunk) + [chunk[-1]] * (pad_to - len(chunk))

            aln_b = np.zeros((pad_to, n_pad, l_pad), np.int32)
            dmap_b = np.zeros((pad_to, l_pad, l_pad), np.float32)
            nseqs_b = np.zeros((pad_to,), np.int32)
            nres_b = np.zeros((pad_to,), np.int32)
            for bi, ti in enumerate(take):
                t = targets[ti]
                ns, nr = t.alnmat.shape
                aln_b[bi, :ns, :nr] = t.alnmat
                dmap_b[bi] = _build_dmap_channel(l_pad, nr, t.template_ca)
                nseqs_b[bi], nres_b[bi] = ns, nr

            if self.mesh is not None:
                args = tuple(
                    put_global(x, data_sharded(self.mesh, x.ndim))
                    for x in (aln_b, nseqs_b, nres_b, dmap_b)
                )
            else:
                args = (jnp.asarray(aln_b), jnp.asarray(nseqs_b),
                        jnp.asarray(nres_b), jnp.asarray(dmap_b))

            if self.mesh is not None:
                # shard_map: map the natively-batched *program* over the
                # data axis so Pallas kernels run per-shard
                coords, confs = _fold_batch_shardmap(
                    self.mesh, **statics)(self.params, *args, *trip)
            else:
                coords, confs = _fold_batch(self.params, *args, *trip,
                                            **statics)
            if self.mesh is not None and jax.process_count() > 1:
                # all-gather the (small) outputs over ICI so every host can
                # fetch every target's result
                coords, confs = replicate_result(self.mesh, (coords, confs))
            return dict(bucket=bucket, chunk=chunk, pad_to=pad_to,
                        nseqs_b=nseqs_b, nres_b=nres_b, owned=owned_slots,
                        coords=coords, confs=confs,
                        t_start=time.perf_counter())

        def requeue(bucket, chunk, owned, exc):
            """A whole batch failed (e.g. OOM at this bucket) — retry each
            target alone so one bad target can't sink its batchmates;
            individual failures are skipped + logged (the reference's
            inline-skip strategy, train.py:81-84)."""
            log_target("batch_failed", 0, 0, bucket, 0.0,
                       None, event="batch_error", error=str(exc)[:200])
            for bi, ti in enumerate(chunk):
                try:
                    results[ti] = self._fold_single(
                        targets[ti], iterations, minsteps)
                    if owned is None or bi in owned:
                        self.counters.record(results[ti][0].shape[0])
                except Exception as exc2:
                    results[ti] = None
                    log_target(f"target[{ti}]", *targets[ti].alnmat.shape,
                               None, 0.0, None, event="target_error",
                               error=str(exc2)[:200])

        def retire(rec):
            """Block on one in-flight batch and scatter its results."""
            try:
                coords, confs = jax.device_get((rec["coords"], rec["confs"]))
            except Exception as exc:  # failure tolerance: requeue singly
                requeue(rec["bucket"], rec["chunk"], rec["owned"], exc)
                return
            elapsed = time.perf_counter() - rec["t_start"]
            pad_to, nres_b, nseqs_b = rec["pad_to"], rec["nres_b"], rec["nseqs_b"]
            for bi, ti in enumerate(rec["chunk"]):
                nr = int(nres_b[bi])
                results[ti] = (coords[bi, :nr], confs[bi, :nr])
                # multi-process: count only targets computed on THIS
                # process's devices (global totals via global_counters)
                if rec["owned"] is None or bi in rec["owned"]:
                    self.counters.record(nr)
                if self.verbose:
                    # per-target time = batch wall-clock / device batch
                    # size; under pipelining this spans dispatch->fetch (may
                    # include queue wait); the first batch of a bucket
                    # includes XLA compilation (batch_seconds lets readers
                    # filter)
                    log_target(
                        f"target[{ti}]", int(nseqs_b[bi]), nr,
                        rec["bucket"], elapsed / pad_to,
                        float(confs[bi, :nr].mean()),
                        batch_seconds=round(elapsed, 4),
                        batch_size=pad_to,
                    )

        work = [(bucket, idxs[start : start + batch])
                for bucket, idxs in groups.items()
                for start in range(0, len(idxs), batch)]
        inflight: list = []

        def pump(block: bool):
            """Advance the dispatch/retire pipeline; with ``block`` drain it."""
            while work:
                if len(inflight) >= self.max_inflight:
                    if not block:
                        return
                    retire(inflight.pop(0))
                bucket, chunk = work.pop(0)
                try:
                    inflight.append(dispatch(bucket, chunk))
                except Exception as exc:
                    # dispatch-time failure (e.g. compile error): fall back
                    # to per-target folds right away
                    requeue(bucket, chunk, owned_slots, exc)
            if block:
                while inflight:
                    retire(inflight.pop(0))

        pump(block=False)

        def wait():
            pump(block=True)
            return results

        return PendingFolds(wait)
