"""Parity of the MXU subspace-iteration eigensolver vs full eigh.

The throughput mode replaces the MDS head's full ``jnp.linalg.eigh``
(reference computes a full symeig and keeps the last 8 columns,
/root/reference/dmpfold/network.py:246-250) with ops/eigh.py's
``subspace_topk``. These tests pin:

  * top-8 eigenpair parity on synthetic matrices with known spectra,
  * mds_coords(impl="subspace") vs impl="eigh" on realistic Grams,
  * padding invariance (padded rows stay exactly zero),
  * end-to-end forward deviation bounds with both implementations.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dmpfold2_tpu.models import gruresnet
from dmpfold2_tpu.models import geometry
from dmpfold2_tpu.models.geometry import mds_coords
from dmpfold2_tpu.ops.eigh import subspace_topk


@pytest.fixture
def force_subspace(monkeypatch):
    """The engine keeps full eigh below SUBSPACE_MIN_L; force the subspace
    path so these tests exercise it at CPU-friendly toy sizes."""
    monkeypatch.setattr(geometry, "SUBSPACE_MIN_L", 0)


def _sym(rng, l, spectrum):
    """Symmetric matrix with the given eigenvalues (random basis)."""
    q, _ = np.linalg.qr(rng.normal(size=(l, l)))
    return (q * spectrum) @ q.T


def test_topk_matches_eigh_separated_spectrum():
    rng = np.random.default_rng(0)
    l = 96
    spectrum = np.sort(rng.uniform(0.5, 1.5, l) * np.geomspace(1e-3, 100.0, l))
    m = jnp.asarray(_sym(rng, l, spectrum), jnp.float32)
    w, v = subspace_topk(m, k=8)
    w_ref, v_ref = jnp.linalg.eigh(m)
    w_ref, v_ref = w_ref[-8:], v_ref[:, -8:]
    np.testing.assert_allclose(w, w_ref, rtol=2e-4)
    # eigenvectors up to sign
    dots = np.abs(np.sum(np.asarray(v) * np.asarray(v_ref), axis=0))
    np.testing.assert_allclose(dots, 1.0, atol=1e-3)


def test_topk_indefinite_algebraic_ordering():
    """Large-|λ| negative eigenvalues must not displace the algebraic top-8."""
    rng = np.random.default_rng(1)
    l = 64
    spectrum = np.concatenate([
        np.array([-90.0, -40.0, -10.0]),              # big negatives
        np.geomspace(1e-4, 1.0, l - 11),              # bulk
        np.geomspace(2.0, 60.0, 8),                   # algebraic top-8
    ])
    m = jnp.asarray(_sym(rng, l, np.sort(spectrum)), jnp.float32)
    w, _ = subspace_topk(m, k=8)
    np.testing.assert_allclose(w, np.geomspace(2.0, 60.0, 8), rtol=2e-4)


def _realistic_dm(rng, l, nres, l_pad=None):
    """Distance map of points with 8 well-separated spatial scales — the
    anchored Gram then has a realistic decaying top-8 spectrum."""
    l_pad = l_pad or l
    pts = rng.normal(size=(nres, 8)) * np.geomspace(8.0, 1.0, 8)
    dm = np.zeros((l_pad, l_pad), np.float32)
    dm[:nres, :nres] = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    return jnp.asarray(dm)


def test_mds_coords_subspace_matches_eigh(force_subspace):
    rng = np.random.default_rng(2)
    dm = _realistic_dm(rng, 96, 82, l_pad=96)
    ref = mds_coords(dm, nres=82, impl="eigh")
    got = mds_coords(dm, nres=82, impl="subspace")
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3 * scale)


def test_mds_coords_subspace_padding_zero_and_stable(force_subspace):
    """Padded rows are exactly zero; padded and unpadded runs agree on the
    valid block (the start bases differ in shape, so agreement is to the
    iteration's convergence tolerance, not bitwise)."""
    rng = np.random.default_rng(3)
    nres = 30
    dm_pad = _realistic_dm(rng, 48, nres, l_pad=48)
    out_pad = np.asarray(mds_coords(dm_pad, nres=nres, impl="subspace"))
    assert np.all(out_pad[nres:] == 0.0)
    dm = dm_pad[:nres, :nres]
    out = np.asarray(mds_coords(dm, nres=nres, impl="subspace"))
    scale = np.max(np.abs(out))
    np.testing.assert_allclose(out_pad[:nres], out, atol=2e-3 * scale)


@pytest.mark.parametrize("seed", [0, 1])
def test_forward_subspace_close_to_eigh(seed, force_subspace):
    """End-to-end forward with the subspace MDS stays structurally identical
    to the eigh run (this bounds what the bf16 throughput mode changes)."""
    key = jax.random.PRNGKey(seed)
    params = gruresnet.init_params(key, width=64, cwidth=32, num_blocks=4)
    rng = np.random.default_rng(seed)
    nseqs, nres = 12, 24
    aln = jnp.asarray(rng.integers(0, 21, (nseqs, nres)), jnp.int32)
    x2 = jnp.asarray(rng.normal(size=(nres, nres, 443)) * 0.1, jnp.float32)
    x2 = x2.at[:, :, -1].set(-1.0)

    out = {}
    for impl in ("eigh", "subspace"):
        coords, confs = gruresnet.forward(
            params, aln, x2, nseqs, nres, jnp.asarray(2), jnp.asarray(10),
            mds_impl=impl)
        out[impl] = (np.asarray(coords), np.asarray(confs))
    dc = np.max(np.abs(out["eigh"][0] - out["subspace"][0]))
    df = np.max(np.abs(out["eigh"][1] - out["subspace"][1]))
    # the MDS seeds agree to ~0.5% of coordinate scale; the downstream
    # GRU/refinement keep the deviation far below structural relevance
    # (bf16 trunk noise is larger)
    assert dc < 0.05, f"coords deviated {dc}"
    assert df < 5e-3, f"confidence deviated {df}"


def test_subspace_gate_small_buckets_fall_back():
    """The production gate (SUBSPACE_MIN_L, un-monkeypatched): below it,
    impl="subspace" must route to the exact eigh path (a q=32 basis cannot
    return 8 full eigenpairs there); at or above it, the subspace path runs
    (round 4 lowered the gate from 192 after the chained probe showed
    subspace faster at every size — the two paths differ numerically only
    to the iteration's convergence tolerance)."""
    rng = np.random.default_rng(7)
    assert geometry.SUBSPACE_MIN_L <= 88, "throughput buckets must qualify"
    # below the gate: bitwise identical to the eigh path
    dm_small = _realistic_dm(rng, geometry.SUBSPACE_MIN_L - 8, 12)
    ref = np.asarray(mds_coords(dm_small, nres=12, impl="eigh"))
    got = np.asarray(mds_coords(dm_small, nres=12, impl="subspace"))
    np.testing.assert_array_equal(got, ref)
    # at the Pfam-bucket size: subspace genuinely runs (close, not bitwise)
    dm = _realistic_dm(rng, 88, 82)
    ref = np.asarray(mds_coords(dm, nres=82, impl="eigh"))
    got = np.asarray(mds_coords(dm, nres=82, impl="subspace"))
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got, ref, atol=2e-2 * scale)
    assert not np.array_equal(got, ref)


def test_subspace_tiny_nres():
    """Rank-deficient valid Gram (nres < ~10, fewer than 8 positive
    eigenvalues): padding's exact-zero eigenpairs can occupy trailing
    top-8 slots in the subspace path — unlike eigh, whose pad_diag sinks
    padding below every valid eigenvalue (advisor round-4 caveat,
    models/geometry.py). The sqrt(1e-8) clamp bounds the impact: outputs
    stay finite, padded rows stay at the 1e-4 clamp scale, and the valid
    region matches eigh to the same scale."""
    rng = np.random.default_rng(13)
    l_pad, nres = 64, 6
    assert geometry.SUBSPACE_MIN_L <= l_pad  # production gate routes subspace
    dm = _realistic_dm(rng, l_pad, nres)
    ref = np.asarray(mds_coords(dm, nres=nres, impl="eigh"))
    got = np.asarray(mds_coords(dm, nres=nres, impl="subspace"))
    assert np.isfinite(got).all()
    scale = max(np.max(np.abs(ref)), 1e-6)
    # leading (positive) eigenpairs agree; rank-deficient trailing columns
    # are clamped to sqrt(1e-8) in both paths, so deviation is clamp-scale
    np.testing.assert_allclose(got[:nres], ref[:nres], atol=5e-2 * scale)
    # eigh zeroes padded rows exactly; subspace may leave clamped
    # zero-eigenvector components there, bounded by sqrt(1e-8) ~ 1e-4
    assert np.abs(got[nres:]).max() <= 1e-3
