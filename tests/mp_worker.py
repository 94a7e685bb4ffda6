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

    np.savez(
        f"{outdir}/proc{pid}.npz",
        loss=np.float32(loss),
        local_targets=np.int32(local_targets),
        global_targets=np.int32(global_counters.targets),
        **{f"coords{i}": r[0] for i, r in enumerate(results)},
        **{f"confs{i}": r[1] for i, r in enumerate(results)},
    )
    print(f"proc {pid}: OK loss={loss} local_targets={local_targets}", flush=True)


def jnp_abs_max_delta(a, b):
    leaves_a, leaves_b = jax.tree.leaves(a), jax.tree.leaves(b)
    return max(float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
               for x, y in zip(leaves_a, leaves_b))


if __name__ == "__main__":
    main()
