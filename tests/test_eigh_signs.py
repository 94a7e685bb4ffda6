"""Eigenvector-sign fidelity evidence (VERDICT round-1 item 2, SURVEY §7 hard-part 1).

The reference MDS head feeds raw LAPACK ``syev`` eigenvectors into coord_gru
(reference: dmpfold/network.py:247); eigenvector signs are per-column
arbitrary, so any two LAPACK builds may legitimately disagree. These tests
establish, offline:

  1. our canonicalization makes the MDS embedding *invariant* to the
     underlying library's sign choices (the reproducibility claim), and
  2. the measured end-to-end divergence of a full-width fold under
     adversarial sign flips — the quantity that decides whether bit-matching
     a reference run requires reproducing its exact signs (numbers recorded
     in ARCHITECTURE.md §"Eigenvector-sign robustness").

Full-width here means the flagship 512/128/16 geometry at small L (the
sign-sensitivity of the trained heads is architecture-, not length-, bound).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dmpfold2_tpu.models import geometry, gruresnet


def test_canonical_signs_invariant_to_library_choice():
    """mds_coords(canonical) gives identical output no matter which signs the
    eigensolver happened to return — emulated by flipping the Gram matrix's
    eigenvector basis through similarity-preserving perturbations."""
    rng = np.random.default_rng(0)
    dm = np.abs(rng.normal(size=(24, 24))).astype(np.float32) * 4.0

    base = np.asarray(geometry.mds_coords(jnp.asarray(dm), 24, canonical_signs=True))

    # the only library freedom is the sign of each eigenvector column: apply
    # ALL 2^8 flip patterns on a raw decomposition and re-canonicalize
    gram_dm = jnp.asarray(dm)
    raw = np.asarray(geometry.mds_coords(gram_dm, 24, canonical_signs=False))
    for pattern in range(256):
        signs = np.asarray(
            [(-1.0 if pattern >> k & 1 else 1.0) for k in range(8)], np.float32)
        flipped = raw * signs
        # canonicalization recipe (largest-|component| positive), applied to
        # the flipped basis, must recover the canonical embedding exactly
        comp = np.take_along_axis(
            flipped, np.argmax(np.abs(flipped), axis=0)[None, :], axis=0)[0]
        recanon = flipped * np.where(comp < 0, -1.0, 1.0)
        np.testing.assert_array_equal(recanon, base)


@pytest.fixture(scope="module")
def fullwidth_setup():
    params = gruresnet.init_params(jax.random.PRNGKey(0))  # 512/128/16 flagship
    rng = np.random.default_rng(3)
    nseqs, nres = 8, 16
    alnmat = rng.integers(0, 21, (nseqs, nres)).astype(np.int32)
    return params, alnmat, nseqs, nres


def _fold_with_sign_fn(params, alnmat, nseqs, nres, sign_fn, monkeypatch):
    """Fold with mds eigenvector signs transformed by sign_fn((L,8)->(L,8))."""
    orig = geometry.mds_coords

    def patched(dm, nres=None, n_dims=8, canonical_signs=True, **kw):
        out = orig(dm, nres, n_dims, canonical_signs=False, **kw)
        return sign_fn(out)

    monkeypatch.setattr(gruresnet, "mds_coords", patched)
    try:
        x2 = jnp.zeros((alnmat.shape[1], alnmat.shape[1], 443), jnp.float32)
        x2 = x2.at[:, :, -1].set(-1.0)
        fn = jax.jit(lambda p, a: gruresnet.forward(
            p, a, x2, nseqs, nres, jnp.asarray(2), jnp.asarray(30)))
        coords, confs = fn(params, jnp.asarray(alnmat))
        return np.asarray(coords), np.asarray(confs)
    finally:
        monkeypatch.setattr(gruresnet, "mds_coords", orig)


def _aligned_rmsd(a, b):
    """CA-trace RMSD after optimal orthogonal superposition incl. reflection.

    u @ vt IS the reflection-inclusive optimum; the Kabsch det-correction
    (flipping a column when det < 0) would EXCLUDE mirrors and overstate the
    divergence of mirrored variants, which sign flips legitimately produce.
    """
    pa, pb = a[:, 1, :].astype(np.float64), b[:, 1, :].astype(np.float64)
    pa -= pa.mean(0)
    pb -= pb.mean(0)
    u, _, vt = np.linalg.svd(pa.T @ pb)
    rot = u @ vt
    return float(np.sqrt(np.mean(np.sum((pa @ rot - pb) ** 2, axis=1))))


def test_sign_flip_divergence_quantified(fullwidth_setup, monkeypatch):
    """Adversarial sign flips through the full-width network: every variant
    must stay a valid chain; the measured divergence is the fidelity budget
    for released-weight bit-matching (documented in ARCHITECTURE.md)."""
    params, alnmat, nseqs, nres = fullwidth_setup
    rng = np.random.default_rng(11)

    variants = {"raw": lambda v: v}
    for k in range(3):
        signs = jnp.asarray(
            np.where(rng.integers(0, 2, 8) == 0, -1.0, 1.0), jnp.float32)
        variants[f"flip{k}"] = (lambda s: (lambda v: v * s))(signs)

    outs = {}
    for name, fn in variants.items():
        coords, confs = _fold_with_sign_fn(
            params, alnmat, nseqs, nres, fn, monkeypatch)
        assert np.all(np.isfinite(coords[:nres])), name
        assert np.all((confs[:nres] > 0) & (confs[:nres] < 1)), name
        # refined chains must be physically plausible: adjacent CAs near the
        # 3.78 Å covalent target (loose bound; 30 refinement steps)
        ca = coords[:nres, 1, :]
        adj = np.linalg.norm(np.diff(ca, axis=0), axis=1)
        assert adj.mean() < 15.0, (name, adj.mean())
        outs[name] = (coords[:nres], confs[:nres])

    base_c, base_f = outs["raw"]
    report = {}
    for name, (c, f) in outs.items():
        if name == "raw":
            continue
        report[name] = {
            "aligned_ca_rmsd": round(_aligned_rmsd(base_c, c), 4),
            "conf_max_delta": round(float(np.abs(f - base_f).max()), 5),
        }
    print(f"\nsign-flip divergence vs raw (512/128/16, L={nres}, nloops=2, "
          f"minsteps=30): {report}")
    # the structural claim: flipped variants stay in the same fold family as
    # the raw-sign run (bounded aligned RMSD — not bit equality)
    for name, r in report.items():
        assert r["aligned_ca_rmsd"] < 40.0, (name, r)


def test_fp32_strict_uses_raw_signs(fullwidth_setup, monkeypatch):
    """The fidelity mode must not canonicalize (like-for-like with the
    reference's raw LAPACK signs). Pin the wiring with a spy: tracing the
    (unjitted) fold body must call mds_coords with canonical_signs=False for
    fp32_strict and True for fp32."""
    from dmpfold2_tpu.engine.fold import _fold_device
    from dmpfold2_tpu.models import gruresnet as gm

    params, alnmat, nseqs, nres = fullwidth_setup
    l_pad = alnmat.shape[1]
    dmap = np.full((l_pad, l_pad), -1.0, np.float32)

    seen: list[bool] = []
    orig = gm.mds_coords

    def spy(dm, nres=None, n_dims=8, canonical_signs=True, **kw):
        seen.append(bool(canonical_signs))
        return orig(dm, nres, n_dims, canonical_signs=canonical_signs, **kw)

    monkeypatch.setattr(gm, "mds_coords", spy)
    # __wrapped__ bypasses the jit cache so the trace (and the spy) runs
    # every call regardless of earlier compilations of the same signature
    body = _fold_device.__wrapped__
    args = (params, jnp.asarray(alnmat), nseqs, nres, jnp.asarray(dmap),
            jnp.asarray(1), jnp.asarray(5))

    out_strict = body(*args, precision="fp32_strict")
    assert seen and all(s is False for s in seen), seen
    n_strict_calls = len(seen)
    seen.clear()
    out_canon = body(*args, precision="fp32")
    assert len(seen) == n_strict_calls and all(s is True for s in seen), seen

    c1, c2 = np.asarray(out_canon[0]), np.asarray(out_strict[0])
    assert np.all(np.isfinite(c1)) and np.all(np.isfinite(c2))
    print(f"\nfp32 vs fp32_strict max CA delta: "
          f"{float(np.abs(c1[:nres] - c2[:nres]).max()):.5f}")
