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
