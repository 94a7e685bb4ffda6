"""Real 2-process emulation of multi-host streaming (VERDICT round-1 item 1).

Launches two actual OS processes that ``jax.distributed.initialize`` against
a localhost coordinator with 4 virtual CPU devices each (8 global), build a
4×2 (data, seq) mesh spanning both processes, and run the multi-host code
paths for real: per-process shard feeding (``mesh.put_global``), ICI result
all-gather (``mesh.replicate_result``), cross-process counter merge
(``BatchFolder.global_counters``), and one data-parallel training step.

The parent asserts both processes produced results identical to a
single-process run of the same mesh-shaped program.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mp_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def mp_outputs(tmp_path_factory):
    outdir = tmp_path_factory.mktemp("mp")
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("DMPFOLD2_TPU_LOG", None)
    # workers log to FILES, not pipes: with pipes, a worker blocked in a
    # collective while its sibling fills an unread 64 KiB pipe (tracebacks,
    # XLA warnings) deadlocks the sequential communicate() below
    logfiles = [open(outdir / f"worker{pid}.log", "w+b") for pid in (0, 1)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, f"127.0.0.1:{port}", "2", str(pid), str(outdir)],
            env=env, cwd=REPO, stdout=logfiles[pid], stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    try:
        for p in procs:
            p.wait(timeout=600)
    finally:
        # never leave orphaned JAX workers spinning if one side hung
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    logs = []
    for fh in logfiles:
        fh.seek(0)
        logs.append(fh.read().decode(errors="replace"))
        fh.close()
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    return {pid: np.load(outdir / f"proc{pid}.npz") for pid in (0, 1)}


def test_two_process_fold_results_match_single_process(mp_outputs):
    """Every process holds every result, and they match a single-process run
    of the same 4×2-mesh program bit-for-near-bit."""
    import jax

    from dmpfold2_tpu.models import gruresnet
    from dmpfold2_tpu.parallel.mesh import make_mesh
    from dmpfold2_tpu.parallel.stream import BatchFolder
    # plain-module import: pytest puts tests/ itself on sys.path (rootdir is
    # NOT importable as a package under the `pytest` console script)
    from mp_worker import make_targets

    params = gruresnet.init_params(jax.random.PRNGKey(0), width=32, cwidth=16,
                                   num_blocks=2)
    mesh = make_mesh(n_data=4, n_seq=2)  # 8 in-process CPU devices (conftest)
    folder = BatchFolder(params, mesh=mesh, batch_size=4)
    reference = folder.fold_many(make_targets(), iterations=1, minsteps=2)

    for pid in (0, 1):
        out = mp_outputs[pid]
        for i, (coords, confs) in enumerate(reference):
            np.testing.assert_allclose(
                out[f"coords{i}"], coords, rtol=1e-5, atol=1e-5,
                err_msg=f"proc {pid} target {i} coords diverge")
            np.testing.assert_allclose(
                out[f"confs{i}"], confs, rtol=1e-5, atol=1e-5,
                err_msg=f"proc {pid} target {i} confs diverge")


def test_two_process_counters_merge(mp_outputs):
    """Per-process counters cover only local shards; the merged view is global."""
    locals_ = [int(mp_outputs[pid]["local_targets"]) for pid in (0, 1)]
    assert sum(locals_) == 6
    assert all(n > 0 for n in locals_), f"one process did no work: {locals_}"
    for pid in (0, 1):
        assert int(mp_outputs[pid]["global_targets"]) == 6


def test_two_process_train_step_losses_agree(mp_outputs):
    """The DP training step computes one global loss, identical on each host."""
    losses = [float(mp_outputs[pid]["loss"]) for pid in (0, 1)]
    assert np.isfinite(losses).all()
    assert abs(losses[0] - losses[1]) < 1e-6, losses


def test_two_process_training_loop_matches_single_with_half_the_io(
        mp_outputs, tmp_path):
    """The real training loop with per-process batch assembly: each host
    parses only its OWNED batch slots (half the train-set file IO), yet the
    trained parameters match a single-process run of the same mesh-shaped
    program (VERDICT round-3 item 8)."""
    import jax

    from dmpfold2_tpu.parallel.mesh import make_mesh
    from mp_worker import (N_TRAIN_CLUSTERS, make_train_dataset,
                           run_training_loop)

    data_root = tmp_path / "data"
    make_train_dataset(str(data_root))
    mesh = make_mesh(n_data=4, n_seq=2)  # 8 in-process CPU devices
    params, single_reads = run_training_loop(str(data_root),
                                             str(tmp_path / "work"), mesh)

    n_val = 2  # validation clusters (full assembly on every host)
    assert single_reads == N_TRAIN_CLUSTERS + n_val
    leaves = jax.tree.leaves(params)
    for pid in (0, 1):
        out = mp_outputs[pid]
        # each worker read only its owned half of the train samples
        assert int(out["io_reads"]) == N_TRAIN_CLUSTERS // 2 + n_val, (
            pid, int(out["io_reads"]))
        for i, leaf in enumerate(leaves):
            np.testing.assert_allclose(
                out[f"trained{i}"], np.asarray(leaf), rtol=2e-5, atol=2e-5,
                err_msg=f"proc {pid} trained leaf {i} diverges")
