"""Batch streaming engine tests: grouping, padding, DP sharding, ordering."""

import numpy as np
import pytest
import jax

from dmpfold2_tpu.engine.fold import Folder
from dmpfold2_tpu.models import gruresnet
from dmpfold2_tpu.parallel.mesh import make_mesh
from dmpfold2_tpu.parallel.stream import BatchFolder, Target


@pytest.fixture(scope="module")
def params():
    return gruresnet.init_params(jax.random.PRNGKey(0), width=32, cwidth=16, num_blocks=2)


@pytest.fixture(scope="module")
def targets():
    rng = np.random.default_rng(0)
    out = []
    for i, (n, l) in enumerate([(8, 20), (12, 25), (6, 20), (10, 40), (7, 22)]):
        out.append(Target(alnmat=rng.integers(0, 22, (n, l)).astype(np.uint8)))
    return out


def test_batch_matches_single(params, targets):
    single = Folder(params)
    batched = BatchFolder(params, batch_size=2)
    batch_results = batched.fold_many(targets, iterations=1, minsteps=3)
    for t, (bc, bf) in zip(targets, batch_results):
        sc, sf = single.fold(t.alnmat, iterations=1, minsteps=3)
        assert bc.shape == sc.shape
        np.testing.assert_allclose(bf, sf, atol=1e-4)
        # batched and single programs fuse differently; refinement amplifies
        # ULP-level op-ordering differences into a few mÅ
        np.testing.assert_allclose(bc, sc, atol=1e-2)


def test_broken_log_sink_does_not_abort_fold(params, targets, monkeypatch, capsys):
    """A misconfigured DMPFOLD2_TPU_LOG (nonexistent directory) must degrade
    to stderr, never raise into the folding loop."""
    import dmpfold2_tpu.utils.obs as obs

    monkeypatch.setenv("DMPFOLD2_TPU_LOG", "/nonexistent-dir/xyz/targets.jsonl")
    monkeypatch.setattr(obs, "_sink_broken", False)
    folder = BatchFolder(params, batch_size=2, verbose=True)
    results = folder.fold_many(targets[:2], iterations=0, minsteps=1)
    assert all(r is not None for r in results)
    err = capsys.readouterr().err
    assert "log sink failed" in err and "target_folded" in err


def test_batch_fp32_strict_matches_single(params, targets):
    """The fidelity mode must produce the same results through the batch
    engine as through the single-target engine (raw eigenvector signs +
    highest matmul precision apply to both — they drifted once)."""
    single = Folder(params, precision="fp32_strict")
    batched = BatchFolder(params, batch_size=2, precision="fp32_strict")
    batch_results = batched.fold_many(targets[:3], iterations=1, minsteps=3)
    for t, (bc, bf) in zip(targets[:3], batch_results):
        sc, sf = single.fold(t.alnmat, iterations=1, minsteps=3)
        np.testing.assert_allclose(bf, sf, atol=1e-4)
        np.testing.assert_allclose(bc, sc, atol=1e-2)


def test_batch_dp_mesh(params, targets):
    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    batched = BatchFolder(params, mesh=mesh, batch_size=4)
    results = batched.fold_many(targets, iterations=1, minsteps=3)
    assert all(r is not None for r in results)
    single = Folder(params)
    for t, (bc, bf) in zip(targets, results):
        sc, sf = single.fold(t.alnmat, iterations=1, minsteps=3)
        np.testing.assert_allclose(bf, sf, atol=1e-4)
        np.testing.assert_allclose(bc, sc, atol=5e-3)


def test_counters_and_logging(params, targets, tmp_path, monkeypatch):
    logfile = tmp_path / "targets.jsonl"
    monkeypatch.setenv("DMPFOLD2_TPU_LOG", str(logfile))
    batched = BatchFolder(params, batch_size=2, verbose=True)
    batched.fold_many(targets[:3], iterations=0, minsteps=0)
    assert batched.counters.targets == 3
    assert batched.counters.targets_per_s() > 0
    import json

    lines = [json.loads(l) for l in logfile.read_text().splitlines()]
    assert len(lines) == 3
    assert all(l["event"] == "target_folded" for l in lines)
    assert lines[0]["nres"] == targets[0].alnmat.shape[1]


def test_profile_context(tmp_path):
    """obs.profile produces a TensorBoard-readable trace directory."""
    import jax.numpy as jnp

    from dmpfold2_tpu.utils.obs import profile

    logdir = str(tmp_path / "trace")
    with profile(logdir):
        jnp.zeros((8, 8)).sum().block_until_ready()
    import os

    found = []
    for root, _, files in os.walk(logdir):
        found.extend(files)
    assert found  # trace artifacts written


def test_counters_merge():
    from dmpfold2_tpu.utils.obs import Counters

    a, b = Counters(), Counters()
    a.record(10); a.record(20); b.record(30)
    merged = Counters.merge([a, b])
    assert merged.targets == 3
    assert merged.residues == 60


def test_batch_non_divisible_by_mesh(params, targets):
    """Batches not divisible by the data axis must pad, not crash."""
    from dmpfold2_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    folder = BatchFolder(params, mesh=mesh, batch_size=3)  # 3 % 4 != 0
    results = folder.fold_many(targets, iterations=0, minsteps=0)
    assert all(r is not None for r in results)


def test_batch_failure_requeues_singly(params, targets, monkeypatch, capsys):
    """Fault injection (VERDICT round-1 item 5): a whole-batch failure must
    retry each member alone so one bad target can't sink its batchmates."""
    from dmpfold2_tpu.parallel import stream as stream_mod

    real_fold_batch = stream_mod._fold_batch
    fail_bucket = {"calls": 0}

    def exploding_fold_batch(params_, alnmat, *args, **kwargs):
        fail_bucket["calls"] += 1
        raise RuntimeError("injected batch failure (fake OOM)")

    monkeypatch.setattr(stream_mod, "_fold_batch", exploding_fold_batch)
    folder = BatchFolder(params, batch_size=2)
    results = folder.fold_many(targets, iterations=0, minsteps=1)
    monkeypatch.setattr(stream_mod, "_fold_batch", real_fold_batch)

    assert fail_bucket["calls"] >= 1
    # every target survived via the single-fold requeue path, in order
    assert all(r is not None for r in results)
    for t, (coords, confs) in zip(targets, results):
        assert coords.shape == (t.alnmat.shape[1], 5, 3)
        assert confs.shape == (t.alnmat.shape[1],)
    # all targets were counted exactly once despite the failures
    assert folder.counters.targets == len(targets)
    err = capsys.readouterr().err
    assert "batch_error" in err


def test_pipelined_matches_sequential(params, targets, monkeypatch):
    """The depth-2 dispatch window must not change results, ordering, or
    counters vs fully sequential retirement — including when one mid-stream
    batch fails at execution time and requeues singly."""
    from dmpfold2_tpu.parallel import stream as stream_mod

    seq = BatchFolder(params, batch_size=2)
    seq.max_inflight = 1
    want = seq.fold_many(targets, iterations=1, minsteps=2)

    pipe = BatchFolder(params, batch_size=2)
    assert pipe.max_inflight == 2
    got = pipe.fold_many(targets, iterations=1, minsteps=2)
    assert pipe.counters.targets == seq.counters.targets == len(targets)
    for (wc, wf), (gc, gf) in zip(want, got):
        np.testing.assert_array_equal(wc, gc)
        np.testing.assert_array_equal(wf, gf)

    # now fail the second dispatched batch only: batchmates of other batches
    # must be untouched and the failed batch's members requeue singly
    real_fold_batch = stream_mod._fold_batch
    calls = {"n": 0}

    def second_call_explodes(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected mid-stream batch failure")
        return real_fold_batch(*args, **kwargs)

    monkeypatch.setattr(stream_mod, "_fold_batch", second_call_explodes)
    pipe2 = BatchFolder(params, batch_size=2)
    got2 = pipe2.fold_many(targets, iterations=1, minsteps=2)
    assert calls["n"] >= 2
    assert pipe2.counters.targets == len(targets)
    for (wc, wf), (gc, gf) in zip(want, got2):
        assert gc.shape == wc.shape
        np.testing.assert_allclose(gf, wf, atol=1e-4)
        np.testing.assert_allclose(gc, wc, atol=1e-2)


def test_retire_time_failure_requeues_singly(params, targets, monkeypatch, capsys):
    """Execution-time failures surface at the retire step's device_get under
    pipelining (async dispatch defers device errors to the fetch); that
    branch must requeue the batch's members singly like a dispatch failure."""
    real_device_get = jax.device_get
    fails = {"n": 0}

    def failing_device_get(x):
        # only intercept fold_many's batched fetch (leading batch dim on the
        # coords tuple); single-fold fetches inside the requeue path and
        # unrelated callers pass through
        if (isinstance(x, tuple) and len(x) == 2
                and getattr(x[0], "ndim", 0) == 4):
            fails["n"] += 1
            if fails["n"] == 2:
                raise RuntimeError("injected retire-time failure (fake async OOM)")
        return real_device_get(x)

    monkeypatch.setattr(jax, "device_get", failing_device_get)
    folder = BatchFolder(params, batch_size=2)
    results = folder.fold_many(targets, iterations=1, minsteps=2)
    monkeypatch.setattr(jax, "device_get", real_device_get)

    assert fails["n"] >= 2
    assert all(r is not None for r in results)
    assert folder.counters.targets == len(targets)
    for t, (coords, confs) in zip(targets, results):
        assert coords.shape == (t.alnmat.shape[1], 5, 3)
    err = capsys.readouterr().err
    assert "batch_error" in err and "retire-time failure" in err


def test_single_target_failure_skips_and_logs(params, targets, monkeypatch, capsys):
    """A target that fails even alone is skipped with a target_error log;
    batchmates still produce results and ordering is preserved."""
    from dmpfold2_tpu.parallel import stream as stream_mod

    def exploding_fold_batch(*args, **kwargs):
        raise RuntimeError("injected batch failure")

    bad_index = 2
    real_fold_single = BatchFolder._fold_single

    def selective_fold_single(self, target, iterations, minsteps):
        if target is targets[bad_index]:
            raise ValueError("injected single-target failure")
        return real_fold_single(self, target, iterations, minsteps)

    monkeypatch.setattr(stream_mod, "_fold_batch", exploding_fold_batch)
    monkeypatch.setattr(BatchFolder, "_fold_single", selective_fold_single)
    folder = BatchFolder(params, batch_size=2)
    results = folder.fold_many(targets, iterations=0, minsteps=1)

    assert results[bad_index] is None
    for i, (t, r) in enumerate(zip(targets, results)):
        if i == bad_index:
            continue
        assert r is not None, f"batchmate {i} was lost"
        assert r[0].shape == (t.alnmat.shape[1], 5, 3)
    assert folder.counters.targets == len(targets) - 1
    err = capsys.readouterr().err
    assert "target_error" in err and "injected single-target failure" in err
