"""Fold-quality regression gate: throughput-mode numerics vs the fp32 engine.

Round-4 verdict weak item 4: perf-motivated numerics gates (bf16 trunk,
subspace MDS at every bucket — models/geometry.py SUBSPACE_MIN_L, commit
278b51e) were bounded only by per-op tolerances; a slow quality drift
across several such gates would have been invisible because no end-to-end
fold-quality number existed. This gate closes the loop: fold the same
inputs through the fp32 engine numerics and through the throughput-mode
numerics (bf16 compute + impl="subspace" MDS — the substantive
divergences; the Pallas kernels have their own interpret-mode parity
tests), score the CA traces against each other with the real TM machinery
(score.py), and assert a floor.

Design notes, from the round-5 calibration experiments:

  * Raw random weights do NOT suffice (the verdict's hope): an untrained
    trunk's distance map is noise, and MDS of noise amplifies bf16-scale
    rounding into TM ~0.4 — indistinguishable from the pipeline's
    intrinsic sensitivity to bf16-epsilon *input* noise (measured
    0.36-0.41), i.e. the bf16 engine loses nothing beyond inherent
    rounding, but an absolute floor there would be meaningless.
  * A short overfit (80 steps on one synthetic target) makes the network
    self-consistent enough that the two engines agree at TM ~0.85
    (measured; the floor leaves margin for cross-platform rounding).
  * Teeth: a deliberately broken subspace eigensolver (5% eigenvector
    noise — the kind of bug a wrong convergence tolerance or a dropped
    re-orthogonalization would produce) must FAIL the floor, so the gate
    is known to detect real numerics breaks, not just refuse to run.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dmpfold2_tpu.features.dca import dca_or_zero
from dmpfold2_tpu.features.msa import msa_one_hot, reweight
from dmpfold2_tpu.models import gruresnet
from dmpfold2_tpu.score import tm_score
from dmpfold2_tpu.train.step import TrainBatch, make_optimizer, train_step

# TM between the fp32 and throughput-numerics folds of identical inputs
# after the overfit below. Measured 0.854 on this fixed seed; 0.75 leaves
# room for platform rounding while catching a ~2x divergence regression.
TM_FLOOR = 0.75

NSEQS, NRES = 16, 48  # NRES >= SUBSPACE_MIN_L: the production gate engages


@pytest.fixture(scope="module")
def overfit_setup():
    """A tiny model briefly overfit to one synthetic target (loss 1.38 ->
    ~0.96 in 80 steps) so its folds are self-consistent enough to score."""
    rng = np.random.default_rng(0)
    params = gruresnet.init_params(jax.random.PRNGKey(3), width=32,
                                   cwidth=16, num_blocks=2)
    aln = rng.integers(0, 21, (NSEQS, NRES)).astype(np.int32)
    # realistic CA trace: 3.78 A random walk; the other 4 atoms nearby
    steps = rng.normal(size=(NRES, 3))
    steps /= np.linalg.norm(steps, axis=1, keepdims=True)
    ca = np.cumsum(steps * 3.78, axis=0).astype(np.float32)
    tgt = np.stack([ca + rng.normal(size=(NRES, 3)).astype(np.float32) * 0.5
                    for _ in range(5)], axis=1)
    tgt[:, 1] = ca
    batch = TrainBatch(jnp.asarray(aln[None]), jnp.asarray(tgt[None]),
                       jnp.full((1,), NSEQS, jnp.int32),
                       jnp.full((1,), NRES, jnp.int32))
    opt = make_optimizer(3e-3)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(11)
    first = last = None
    for _ in range(80):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = train_step(
            params, opt_state, batch, sub, optimizer=opt,
            nloops=0, refine_steps=0)
        last = float(metrics["loss"])
        first = first if first is not None else last
    assert last < first, "overfit did not reduce the loss at all"
    return params, aln


def _fold(params, aln, *, compute_dtype, mds_impl):
    oh = msa_one_hot(jnp.asarray(aln), NSEQS, NRES)
    w = reweight(oh, NRES)
    dca = dca_or_zero(oh, w, NSEQS, NRES)
    dmap = jnp.full((NRES, NRES), -1.0)
    x2 = jnp.concatenate([dca, dmap[:, :, None]], axis=2)
    coords, _ = gruresnet.forward(
        params, jnp.asarray(aln), x2, NSEQS, NRES, 2, 20,
        compute_dtype=compute_dtype, mds_impl=mds_impl)
    return np.asarray(coords[:NRES], np.float32)


def test_throughput_numerics_tm_floor(overfit_setup):
    params, aln = overfit_setup
    ref = _fold(params, aln, compute_dtype=None, mds_impl="eigh")
    got = _fold(params, aln, compute_dtype=jnp.bfloat16, mds_impl="subspace")
    score = tm_score(got[:, 1], ref[:, 1])
    assert score["tm"] >= TM_FLOOR, (
        f"throughput-mode fold quality regressed: TM {score['tm']:.3f} vs "
        f"fp32 engine (floor {TM_FLOOR}); RMSD {score['rmsd']:.2f} A")


def test_quality_gate_has_teeth(overfit_setup, monkeypatch):
    """A genuinely broken throughput-numerics path must FAIL the floor —
    otherwise the gate proves nothing. Simulates a buggy subspace solver
    (5% deterministic noise on the returned eigenvectors)."""
    from dmpfold2_tpu.models import geometry
    from dmpfold2_tpu.ops import eigh as eigh_mod

    params, aln = overfit_setup
    ref = _fold(params, aln, compute_dtype=None, mds_impl="eigh")

    real_topk = eigh_mod.subspace_topk

    def broken_topk(gram, k=8, **kw):
        w8, v8 = real_topk(gram, k=k, **kw)
        noise = jax.random.normal(jax.random.PRNGKey(0), v8.shape)
        return w8, v8 + 0.05 * noise

    # geometry imports subspace_topk inside mds_coords, so patching the
    # source module is enough
    monkeypatch.setattr(eigh_mod, "subspace_topk", broken_topk)
    assert geometry  # imported for clarity of what consumes the patch
    bad = _fold(params, aln, compute_dtype=jnp.bfloat16, mds_impl="subspace")
    bad_score = tm_score(bad[:, 1], ref[:, 1])
    assert bad_score["tm"] < TM_FLOOR, (
        "the quality gate has no teeth: a deliberately broken eigensolver "
        f"still passes (TM {bad_score['tm']:.3f})")
