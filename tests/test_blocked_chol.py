"""Blocked Cholesky inverse vs stock linalg (small sizes, small panels)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dmpfold2_tpu.ops.chol import blocked_spd_inverse


def _spd(n, seed=0, cond=5.0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, n)).astype(np.float32) * 0.2
    return jnp.asarray(a @ a.T + cond * np.eye(n, dtype=np.float32))


@pytest.mark.parametrize("n,panel", [(64, 16), (96, 32), (70, 16), (128, 128)])
def test_blocked_inverse_matches_stock(n, panel):
    a = _spd(n, seed=n)
    ref = np.asarray(jnp.linalg.inv(a))
    out = np.asarray(blocked_spd_inverse(a, panel=panel))
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)


def test_blocked_inverse_identity():
    a = _spd(80, seed=1)
    inv = blocked_spd_inverse(a, panel=16)
    np.testing.assert_allclose(np.asarray(a @ inv), np.eye(80), atol=2e-4)


@pytest.mark.parametrize("n,base", [(64, 64), (100, 32), (301, 64), (256, 32)])
def test_schur_inverse_matches_stock(n, base):
    """Recursive Schur-complement inverse vs stock LU, incl. odd splits."""
    from dmpfold2_tpu.ops.chol import schur_spd_inverse

    a = _spd(n, seed=n + 7)
    ref = np.asarray(jnp.linalg.inv(a))
    out = np.asarray(schur_spd_inverse(a, base=base))
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)
    # the assembled inverse must be exactly symmetric-by-construction blocks
    np.testing.assert_allclose(out, out.T, atol=2e-5)


def test_schur_inverse_batched():
    from dmpfold2_tpu.ops.chol import schur_spd_inverse

    a = jnp.stack([_spd(96, seed=i) for i in range(3)])
    out = np.asarray(schur_spd_inverse(a, base=32))
    for i in range(3):
        ref = np.asarray(jnp.linalg.inv(a[i]))
        np.testing.assert_allclose(out[i], ref, atol=5e-4, rtol=1e-3)


def test_fast_dca_schur_matches_lu():
    """features-level check: the schur method reproduces the reference LU
    inverse math to float tolerance (same bar as the cholesky method)."""
    from dmpfold2_tpu.features.dca import fast_dca
    from dmpfold2_tpu.features.msa import msa_one_hot, reweight

    rng = np.random.default_rng(3)
    ns, nr = 24, 18
    aln = np.zeros((32, 24), np.int32)
    aln[:ns, :nr] = rng.integers(0, 22, (ns, nr))
    oh = msa_one_hot(jnp.asarray(aln), ns, nr)
    w = reweight(oh, nr)
    f_lu = np.asarray(fast_dca(oh, w, ns, nr, method="lu"))
    f_schur = np.asarray(fast_dca(oh, w, ns, nr, method="schur"))
    np.testing.assert_allclose(f_schur, f_lu, atol=2e-3)
