"""Worker process for the 2-process emulation test (test_multiprocess.py).

Runs under ``jax.distributed`` with N processes × 4 local CPU devices each:
folds a deterministic target list through the multi-host streaming path,
runs one data-parallel training step, and dumps results for the parent test
to compare against a single-process run. Usage:

    python mp_worker.py <coordinator> <num_processes> <process_id> <outdir>
"""

import os
import sys

# self-sufficient import path: the worker must run from a bare `python
# tests/mp_worker.py` regardless of whether the package is pip-installed
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# must precede any backend instantiation (the axon sitecustomize forces
# JAX_PLATFORMS=axon via env; the config update still wins at this point)
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def make_targets():
    """Deterministic pseudo-alignments, same on every process."""
    from dmpfold2_tpu.parallel.stream import Target

    rng = np.random.default_rng(7)
    targets = []
    for i in range(6):
        nseqs, nres = 4 + i, 12 + (i % 3)
        targets.append(Target(alnmat=rng.integers(0, 21, (nseqs, nres)).astype(np.int32)))
    return targets


N_TRAIN_CLUSTERS = 8
TRAIN_MICRO_BATCH = 4


def make_train_dataset(root: str) -> None:
    """Synthetic tdb/aln training data, bit-identical on every caller.

    2 validation clusters + N_TRAIN_CLUSTERS train clusters over 4 targets
    (the loader is patched to a 2-cluster validation split in
    run_training_loop).
    """
    os.makedirs(os.path.join(root, "tdb"), exist_ok=True)
    os.makedirs(os.path.join(root, "aln"), exist_ok=True)
    rng = np.random.default_rng(21)
    letters = "ARNDCQEGHILKMFPSTWYV"
    ids = []
    for k in range(4):
        length = 14 + 2 * k
        tid = f"t{k}"
        ids.append(tid)
        classes = rng.integers(0, 20, length)
        # helix-ish coords: random ones make the Kabsch SVD gradient
        # degenerate and the non-finite guard would skip every step
        t = np.arange(length, dtype=np.float32)
        helix = np.stack([2.3 * np.cos(0.6 * t), 2.3 * np.sin(0.6 * t),
                          1.5 * t], -1)
        coords = helix[:, None, :] + rng.normal(size=(length, 5, 3)) * 0.3
        with open(os.path.join(root, "tdb", f"{tid}.tdb"), "w") as fh:
            fh.write("# synthetic\n")
            for i, cls in enumerate(classes):
                line = list(" " * 39)
                line[5] = letters[cls % 20]
                row = "".join(line)
                for atom in coords[i]:
                    row += "".join(f"{v:9.3f}" for v in atom)
                fh.write(row + "\n")
        rows = ["".join(letters[c] for c in classes)]
        for _ in range(5):
            rows.append("".join(
                letters[c] if rng.random() > 0.2 else "-"
                for c in rng.integers(0, 20, length)))
        with open(os.path.join(root, "aln", f"{tid}.aln"), "w") as fh:
            fh.write("\n".join(rows) + "\n")
    clusters = [ids[0], ids[1]]  # validation (first 2)
    for k in range(N_TRAIN_CLUSTERS):
        clusters.append(" ".join({0: [ids[2]], 1: [ids[3]],
                                  2: [ids[2], ids[3]]}[k % 3]))
    with open(os.path.join(root, "clusters.lst"), "w") as fh:
        fh.write("\n".join(clusters) + "\n")


def run_training_loop(data_root: str, workdir: str, mesh):
    """One epoch of the REAL training loop (per-process batch assembly path).

    Returns (params, io_reads): io_reads counts dataset file loads on this
    process — multi-process runs must only assemble their owned batch slots.
    """
    from dmpfold2_tpu.config import TrainConfig
    from dmpfold2_tpu.train import dataset as ds_mod
    from dmpfold2_tpu.train import loop as loop_mod

    datasets = []
    real_cls = ds_mod.DMPDataset

    class CountingDataset(real_cls):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            datasets.append(self)

    os.makedirs(workdir, exist_ok=True)
    orig_loader = loop_mod.load_cluster_list
    loop_mod.DMPDataset = CountingDataset
    loop_mod.load_cluster_list = (
        lambda p: ds_mod.load_cluster_list(p, validation_clusters=2))
    try:
        params = loop_mod.train(
            data_dir=data_root, clusters="clusters.lst", workdir=workdir,
            num_epochs=1, micro_batch=TRAIN_MICRO_BATCH, accum_steps=4,
            restart=False, refine_steps=2, seed=5,
            model_kwargs=dict(width=16, cwidth=8, num_blocks=2),
            mesh=mesh, cfg=TrainConfig(max_iterations=1))
    finally:
        loop_mod.DMPDataset = real_cls
        loop_mod.load_cluster_list = orig_loader
    return params, sum(d.reads for d in datasets)


def main():
    coord, nproc, pid, outdir = (sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
                                 sys.argv[4])
    jax.distributed.initialize(coordinator_address=coord, num_processes=nproc,
                               process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    from dmpfold2_tpu.models import gruresnet
    from dmpfold2_tpu.parallel.mesh import make_mesh
    from dmpfold2_tpu.parallel.stream import BatchFolder

    params = gruresnet.init_params(jax.random.PRNGKey(0), width=32, cwidth=16,
                                   num_blocks=2)
    mesh = make_mesh(n_data=4, n_seq=2)  # spans both processes
    targets = make_targets()

    folder = BatchFolder(params, mesh=mesh, batch_size=4)
    results = folder.fold_many(targets, iterations=1, minsteps=2)
    assert all(r is not None for r in results)

    local_targets = folder.counters.targets
    global_counters = folder.global_counters()
    assert global_counters.targets == len(targets), (
        global_counters.targets, local_targets)

    # --- one data-parallel training step over the same global mesh
    from dmpfold2_tpu.parallel.mesh import data_sharded, put_global, replicated
    from dmpfold2_tpu.train.step import TrainBatch, make_optimizer, train_step

    rng = np.random.default_rng(11)
    bsz, n_rows, l_pad = 4, 6, 16
    # helix-like ground truth: random targets make the Kabsch SVD gradient
    # degenerate (the non-finite guard then skips the step)
    t = np.arange(l_pad, dtype=np.float32)
    helix = np.stack([2.3 * np.cos(0.6 * t), 2.3 * np.sin(0.6 * t), 1.5 * t], -1)
    gt = (helix[None, :, None, :]
          + rng.normal(size=(bsz, l_pad, 5, 3)).astype(np.float32) * 0.3)
    batch_np = TrainBatch(
        rng.integers(0, 21, (bsz, n_rows, l_pad)).astype(np.int32),
        gt.astype(np.float32),
        np.full((bsz,), n_rows, np.int32),
        np.full((bsz,), 14, np.int32),
    )
    params_d = put_global(params, replicated(mesh))
    optimizer = make_optimizer(1e-4)
    opt_state = put_global(optimizer.init(params), replicated(mesh))
    batch = TrainBatch(*(put_global(x, data_sharded(mesh, x.ndim))
                         for x in batch_np))
    new_params, _, metrics = train_step(
        params_d, opt_state, batch, jax.random.PRNGKey(3), optimizer=optimizer,
        nloops=1, refine_steps=2)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    delta = float(jnp_abs_max_delta(params_d, new_params))
    assert delta > 0.0, "training step did not update parameters"

    # --- one epoch of the real training loop: per-process batch assembly
    # (each host parses only its owned slots; results must match the
    # single-process run the parent test performs)
    data_root = f"{outdir}/data{pid}"
    make_train_dataset(data_root)
    trained, io_reads = run_training_loop(data_root, f"{outdir}/work{pid}",
                                          mesh)
    trained_leaves = {f"trained{i}": np.asarray(x)
                      for i, x in enumerate(jax.tree.leaves(trained))}

    np.savez(
        f"{outdir}/proc{pid}.npz",
        loss=np.float32(loss),
        local_targets=np.int32(local_targets),
        global_targets=np.int32(global_counters.targets),
        io_reads=np.int32(io_reads),
        **trained_leaves,
        **{f"coords{i}": r[0] for i, r in enumerate(results)},
        **{f"confs{i}": r[1] for i, r in enumerate(results)},
    )
    print(f"proc {pid}: OK loss={loss} local_targets={local_targets} "
          f"io_reads={io_reads}", flush=True)


def jnp_abs_max_delta(a, b):
    leaves_a, leaves_b = jax.tree.leaves(a), jax.tree.leaves(b)
    return max(float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
               for x, y in zip(leaves_a, leaves_b))


if __name__ == "__main__":
    main()
