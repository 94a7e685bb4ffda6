"""Training driver: epochs over the cluster dataset with checkpoint/resume.

Mirrors the reference main loop (reference: dmpfold/train.py:230-422):
shuffled clusters, random recycling depth per micro-batch, fixed-seed
validation with nloops=2, best-val / best-train / rolling checkpoint saves.
Run as ``python -m dmpfold2_tpu.train.loop --data-dir ... --clusters ...``.
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..config import TrainConfig
from ..models import gruresnet
from . import checkpoint as ckpt
from .dataset import DMPDataset, load_cluster_list, local_bucket, pad_to_bucket
from .step import TrainBatch, make_optimizer, train_step


def _sample_rng(seed: int, epoch: int, index: int) -> random.Random:
    """Augmentation RNG for one (epoch, dataset-index) pair.

    Derived, not sequential: every host can compute any sample's draws
    without having visited the others — the property per-process batch
    assembly needs (a shared sequential stream would desync the moment one
    host skips the file IO for a slot it doesn't own).
    """
    return random.Random((seed * 1_000_003 + epoch) * 2_654_435_761
                         + index * 97 + 13)


def _make_batches(dataset, indices, micro_batch: int, drop_last: bool = True,
                  rng_for=None, owned: set[int] | None = None):
    """Yield lists of Samples (None for batch slots owned by other hosts).

    Assembly (file IO, parsing, augmentation) happens here — under
    ``_prefetch`` that is a background thread; the consumer pads and
    uploads. ``owned`` restricts assembly to this process's batch slots
    (multi-process training): the O(P)-redundant full-batch parse every
    host used to do is the pod-scale host bottleneck.
    """
    end = len(indices) - micro_batch + 1 if drop_last else len(indices)
    for start in range(0, max(end, 0), micro_batch):
        chunk = indices[start : start + micro_batch]
        yield [
            dataset.get(di, rng_for(di) if rng_for is not None else None)
            if (owned is None or slot in owned) else None
            for slot, di in enumerate(chunk)
        ]


def _prefetch(iterator, depth: int = 2):
    """Host-side input pipeline: build upcoming micro-batches (file IO, aln
    parsing, augmentation, bucket padding) on a background thread while the
    device runs the current step. The reference gets this overlap from a
    spawned DataLoader worker (train.py:290,421 — a process boundary crossed
    per sample); a thread suffices here because batch assembly is
    numpy/file-IO work that releases the GIL, and it preserves the exact
    sequential dataset access order the seed-derived augmentation RNG (and
    multi-process host synchronization) depend on.
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    end = object()
    failure: list[BaseException] = []
    stop = threading.Event()

    def _put(item) -> bool:
        # bounded put that re-checks stop: if the consumer abandons the
        # generator mid-epoch (e.g. train_step raised), the worker must not
        # block forever on a full queue with micro-batches pinned in memory
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterator:
                if not _put(item):
                    return
        except BaseException as exc:  # re-raised on the consumer thread
            failure.append(exc)
        finally:
            _put(end)

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is end:
                if failure:
                    raise failure[0]
                return
            yield item
    finally:
        stop.set()


def train(data_dir: str = ".", clusters: str = "train_clust.lst",
          workdir: str = ".", num_epochs: int = 1000,
          micro_batch: int | None = None, accum_steps: int | None = None,
          restart: bool | None = None, refine_steps: int | None = None,
          seed: int = 0, model_kwargs: dict | None = None,
          mesh=None, precision: str = "fp32", cfg: TrainConfig | None = None):
    """Explicit keyword arguments override ``cfg``; None falls back to it
    (so a programmatic TrainConfig actually takes effect).

    A ``mesh`` with a non-trivial ``seq`` axis also activates the
    within-sample pair-tensor sharding constraints: the whole run executes
    under ``jax.set_mesh`` so parallel/sharding derives the constraint from
    the ambient mesh (a 4x2 mesh without the context would silently leave
    the seq devices holding idle replicas)."""
    import contextlib

    ctx = jax.set_mesh(mesh) if mesh is not None else contextlib.nullcontext()
    with ctx:
        return _train_impl(data_dir, clusters, workdir, num_epochs,
                           micro_batch, accum_steps, restart, refine_steps,
                           seed, model_kwargs, mesh, precision, cfg)


def _train_impl(data_dir, clusters, workdir, num_epochs, micro_batch,
                accum_steps, restart, refine_steps, seed, model_kwargs,
                mesh, precision, cfg):
    cfg = cfg or TrainConfig()
    micro_batch = cfg.micro_batch if micro_batch is None else micro_batch
    accum_steps = cfg.batch_size if accum_steps is None else accum_steps
    restart = cfg.restart if restart is None else restart
    refine_steps = cfg.refine_steps if refine_steps is None else refine_steps
    clusters_path = os.path.join(data_dir, clusters)
    if not os.path.isfile(clusters_path):
        # fall back to the packaged canonical list (identical to the
        # reference's dmpfold/train_clust.lst; see example/README.md) so a
        # standalone checkout trains without copying it into data_dir
        from ..utils.assets import cluster_list_path

        if os.path.isfile(cluster_list_path()):
            print(f"{clusters_path} not found; using packaged cluster list")
            clusters_path = cluster_list_path()
    train_list, validation_list = load_cluster_list(clusters_path)
    print(f"{len(train_list)} training / {len(validation_list)} validation clusters")

    params = gruresnet.init_params(jax.random.PRNGKey(seed), **(model_kwargs or {}))
    lr = cfg.learning_rate_scratch
    if restart:
        best_train = os.path.join(workdir, ckpt.BEST_TRAIN)
        if os.path.isfile(best_train):
            params, n = ckpt.partial_restore(params, best_train)
            print(f"warm restart: {n} tensors restored from {best_train}")
            lr = cfg.learning_rate_restart  # reference train.py:263

    # accum_steps counts SAMPLES (the reference's 32-sample Adam step,
    # train.py:21): convert to micro-batch steps
    if mesh is not None:
        # keep training micro-batches an exact data-axis multiple so no
        # padding (and no duplicated-sample gradient weighting) is needed
        n_data_axis = mesh.shape.get("data", 1)
        micro_batch = -(-micro_batch // n_data_axis) * n_data_axis
    micro_steps = max(1, accum_steps // micro_batch)
    optimizer = make_optimizer(lr, accum_steps=micro_steps)
    opt_state = optimizer.init(params)

    val_err_min = train_err_min = float("inf")
    start_epoch = 0
    state = ckpt.load_train_state(workdir)
    if state is not None:
        opt_state = jax.tree.map(jnp.asarray, state["opt_state"])
        start_epoch = state["epoch"] + 1
        val_err_min = state["val_err_min"]
        train_err_min = state["train_err_min"]
        # the resumed optimizer moments (and any mid-accumulation MultiSteps
        # buffer) were computed against the LATEST params — restore those,
        # not best-train (possibly epochs old) or fresh random init
        latest = os.path.join(workdir, ckpt.LATEST)
        if os.path.isfile(latest):
            params, n = ckpt.partial_restore(params, latest)
            stamp = np.load(latest)
            if ("__epoch__" in stamp
                    and int(stamp["__epoch__"]) != state["epoch"]):
                print(f"WARNING: {ckpt.LATEST} is from epoch "
                      f"{int(stamp['__epoch__'])} but {ckpt.CHECKPOINT} is "
                      f"from epoch {state['epoch']} (crash between the two "
                      f"writes?) — optimizer moments may not match params")
            print(f"checkpoint loaded, resuming at epoch {start_epoch} "
                  f"({n} tensors from {ckpt.LATEST})")
        else:
            print(f"checkpoint loaded, resuming at epoch {start_epoch} "
                  f"(WARNING: no {ckpt.LATEST}; optimizer state may not "
                  f"match params)")

    # multi-process: assemble only the batch slots whose data-axis shards
    # live on this host's devices (VERDICT round-3 item 8 — every host
    # parsing the full global micro-batch is O(P) redundant host work).
    # The global bucket shape is then agreed with a tiny all-gather per
    # batch, issued from THIS (main) thread so collective launch order
    # stays identical on every host (the prefetch thread only does IO).
    owned_slots: set[int] | None = None
    if mesh is not None and jax.process_count() > 1:
        from ..parallel.mesh import data_sharded, owned_batch_indices

        owned_slots = owned_batch_indices(
            data_sharded(mesh, 1), (micro_batch,))

    def global_bucket(samples) -> tuple[int, int]:
        bucket = local_bucket(samples)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            g = np.asarray(multihost_utils.process_allgather(
                np.asarray(bucket, np.int32)))
            bucket = (int(g[..., 0].max()), int(g[..., 1].max()))
        return bucket

    shard_batch = lambda b: b
    if mesh is not None:
        # data-parallel training: weights replicated, micro-batch sharded
        # over the mesh's 'data' axis (GSPMD inserts the gradient psum).
        # Placement happens after any checkpoint resume so restored state
        # lands on the mesh too.
        from ..parallel.mesh import data_sharded, put_global, replicated

        # put_global (vs plain device_put) keeps this path valid under
        # multi-process JAX: each host contributes its local devices' shards
        params = put_global(params, replicated(mesh))
        opt_state = put_global(opt_state, replicated(mesh))
        n_data = mesh.shape.get("data", 1)

        def shard_batch(b):
            size = b.alnmat.shape[0]
            if size % n_data:
                # pad to a data-axis multiple by repeating the tail sample
                pad = n_data - size % n_data
                b = type(b)(*(jnp.concatenate([x, x[-1:].repeat(pad, axis=0)])
                              for x in b))
            return type(b)(*(put_global(np.asarray(x), data_sharded(mesh, x.ndim))
                             for x in b))

    # deterministic, seed-derived host RNG: under multi-PROCESS training every
    # host must draw the same shuffle, the same per-batch nloops (a STATIC
    # trip count — different values would compile different programs whose
    # collectives deadlock) and the same augmentation choices, or the hosts'
    # global batches diverge silently. Augmentation draws come from a
    # per-(seed, epoch, index) RNG (_sample_rng) rather than one sequential
    # stream, so a host can skip samples it doesn't own without desyncing.
    # (The reference uses fresh entropy, train.py:359 — fine single-process;
    # seeding also buys reproducibility.)
    train_data = DMPDataset(train_list, data_dir, augment=True,
                            crop_len=cfg.crop_len, max_aln_size=cfg.max_aln_size)
    val_data = DMPDataset(validation_list, data_dir, augment=False,
                          crop_len=cfg.crop_len, max_aln_size=cfg.max_aln_size)
    rng = jax.random.PRNGKey(seed + 1)

    # natively-batched forward off-mesh (enables the fused Pallas conv VJP
    # under bf16 on TPU); vmapped spmd_axis_name path for mesh partitioning
    native_batch = (mesh is None) if cfg.native_batch == "auto" else bool(cfg.native_batch)
    fused_conv = (native_batch and precision == "bf16"
                  and jax.default_backend() == "tpu")

    max_nloops = cfg.max_iterations

    for epoch in range(start_epoch, start_epoch + num_epochs):
        t0 = time.time()
        py_rng = random.Random(seed * 1_000_003 + epoch)  # host-synchronized
        indices = list(range(len(train_data)))
        py_rng.shuffle(indices)

        train_err, train_samples, train_bad = 0.0, 0, 0
        rng_for = lambda di: _sample_rng(seed, epoch, di)
        for samples in _prefetch(_make_batches(train_data, indices, micro_batch,
                                               rng_for=rng_for,
                                               owned=owned_slots)):
            batch = TrainBatch(*pad_to_bucket(samples, global_bucket(samples)))
            true_size = batch.alnmat.shape[0]
            batch = shard_batch(batch)
            rng, sub = jax.random.split(rng)
            nloops = py_rng.randint(0, max_nloops)
            params, opt_state, metrics = train_step(
                params, opt_state, batch, sub, optimizer=optimizer,
                nloops=nloops, refine_steps=refine_steps, precision=precision,
                native_batch=native_batch, fused_conv=fused_conv,
            )
            loss = float(metrics["loss"])
            if np.isfinite(loss):
                train_err += loss * true_size
                train_samples += true_size
            else:
                train_bad += 1

        # fixed-key validation with nloops=2 (train.py:383-389): the fixed
        # PRNGKey makes teacher-forcing draws repeat across epochs
        val_rng = jax.random.PRNGKey(1)
        val_err, val_samples, val_bad = 0.0, 0, 0
        # validation keeps full per-host assembly (owned=None): its partial
        # final batch pads by repeating the tail sample, which the padding
        # slot's owner can only supply if it assembled it
        for samples in _prefetch(_make_batches(val_data,
                                               list(range(len(val_data))),
                                               micro_batch, drop_last=False)):
            batch = TrainBatch(*pad_to_bucket(samples, global_bucket(samples)))
            # shard_batch may pad a partial batch by repeating the tail
            # sample; sum only the TRUE samples' losses (eval returns the
            # per-sample vector) so duplicated padding samples don't skew
            # best-val selection
            true_size = batch.alnmat.shape[0]
            batch = shard_batch(batch)
            val_rng, sub = jax.random.split(val_rng)
            _, _, metrics = train_step(
                params, opt_state, batch, sub, optimizer=optimizer,
                nloops=2, refine_steps=refine_steps, train=False,
                precision=precision, native_batch=native_batch,
                fused_conv=fused_conv,
            )
            sl = metrics["sample_loss"]
            if mesh is not None and jax.process_count() > 1:
                # data-sharded output: all-gather before the host fetch
                # (device_get of non-addressable shards raises)
                from ..parallel.mesh import replicate_result
                sl = replicate_result(mesh, sl)
            sample_losses = np.asarray(sl)[:true_size]
            if np.isfinite(sample_losses).all():
                val_err += float(sample_losses.sum())
                val_samples += true_size
            else:
                val_bad += 1

        print(f"Epoch {epoch + 1} took {time.time() - t0:.1f}s  "
              f"train {train_err / max(train_samples, 1):.6f}  "
              f"val {val_err / max(val_samples, 1):.6f}")
        sys.stdout.flush()

        # guard best-model selection against NaN epochs: an epoch with
        # non-finite batches must not look "better" by summing fewer terms
        # (deviation from the reference, which has the same skip-and-sum
        # bias). Only process 0 writes checkpoints — concurrent writers to a
        # shared workdir would corrupt the files every other host restarts
        # from.
        is_writer = jax.process_index() == 0
        if val_bad == 0 and val_samples > 0 and val_err < val_err_min:
            val_err_min = val_err
            if is_writer:
                ckpt.save_params(os.path.join(workdir, ckpt.BEST_VAL), params)
                print("Saving best-validation model...")
        if train_bad == 0 and train_samples > 0 and train_err < train_err_min:
            train_err_min = train_err
            if is_writer:
                ckpt.save_params(os.path.join(workdir, ckpt.BEST_TRAIN), params)
                print("Saving best-training model...")
        if is_writer:
            ckpt.save_train_state(workdir, epoch, opt_state, val_err_min,
                                  train_err_min, params=params)

    return params


def main(argv=None):
    # CLI defaults come from the shared config dataclass (SURVEY §5: single
    # source of configuration, reference train.py:21-33 module constants)
    cfg = TrainConfig()
    ap = argparse.ArgumentParser(description="Train the TPU-native GRUResNet")
    ap.add_argument("--data-dir", default=".")
    ap.add_argument("--clusters", default="train_clust.lst")
    ap.add_argument("--workdir", default=".")
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--micro-batch", type=int, default=cfg.micro_batch)
    ap.add_argument("--accum-steps", type=int, default=cfg.batch_size)
    ap.add_argument("--refine-steps", type=int, default=cfg.refine_steps)
    ap.add_argument("--no-restart", action="store_true")
    ap.add_argument("--precision", default="fp32", choices=["fp32", "bf16"])
    # model geometry (flagship defaults; smaller values for experiments —
    # warm restart is shape-filtered, so architecture sweeps stay restartable)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--cwidth", type=int, default=128)
    ap.add_argument("--num-blocks", type=int, default=16)
    ap.add_argument("--mesh", default=None, metavar="DATA[xSEQ]",
                    help="train over a device mesh, e.g. '8' or '4x2'; "
                         "'auto' = all devices data-parallel; SEQ>1 also "
                         "shards the O(L²) pair tensors within each sample")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-process training on a TPU pod: initialize "
                         "jax.distributed from the auto-detected cluster env "
                         "(every host runs the same command)")
    ap.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                    help="multi-process training off-pod (manual launch): "
                         "jax.distributed coordinator; requires "
                         "--num-processes and --process-id on every host")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args(argv)

    if args.coordinator is not None and (args.num_processes is None
                                         or args.process_id is None):
        ap.error("--coordinator requires --num-processes and --process-id")
    if args.coordinator is None and (args.num_processes is not None
                                     or args.process_id is not None):
        ap.error("--num-processes/--process-id only apply with --coordinator "
                 "(use --distributed for TPU-pod env auto-detection)")

    mesh = None
    if args.distributed or args.coordinator is not None or args.mesh is not None:
        from ..parallel.mesh import initialize_distributed, make_mesh

        if args.distributed or args.coordinator is not None:
            initialize_distributed(args.coordinator, args.num_processes,
                                   args.process_id)
            if args.mesh is None:
                args.mesh = "auto"  # span the whole slice by default
        if args.mesh == "auto":
            mesh = make_mesh()
        else:
            n_data, _, n_seq = args.mesh.partition("x")
            mesh = make_mesh(int(n_data), int(n_seq or 1))

    train(args.data_dir, args.clusters, args.workdir, args.epochs,
          args.micro_batch, args.accum_steps, restart=not args.no_restart,
          refine_steps=args.refine_steps, precision=args.precision, mesh=mesh,
          model_kwargs=dict(width=args.width, cwidth=args.cwidth,
                            num_blocks=args.num_blocks))


if __name__ == "__main__":
    main()
