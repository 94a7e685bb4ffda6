"""Pallas kernel correctness vs the lax.scan reference path (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dmpfold2_tpu.kernels.vgru import vgru_final_pallas
from dmpfold2_tpu.models import gru


@pytest.fixture(scope="module")
def layers():
    key = jax.random.PRNGKey(0)
    return gru.unigru_stack_params(key, 2, 22, 64)


def _ref(layers, aln, valid):
    x = jnp.asarray(aln[..., None] == jnp.arange(22), jnp.float32)
    return gru.unigru_stack_final(layers, x, valid_len=valid)


def test_vgru_kernel_matches_scan(layers):
    rng = np.random.default_rng(0)
    aln = jnp.asarray(rng.integers(0, 22, (20, 16)), jnp.int32)
    ref = _ref(layers, aln, 20)
    out = vgru_final_pallas(layers, aln, 20, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_vgru_kernel_masked(layers):
    rng = np.random.default_rng(1)
    aln = jnp.asarray(rng.integers(0, 22, (24, 16)), jnp.int32)
    valid = 15
    ref = _ref(layers, aln, valid)
    out = vgru_final_pallas(layers, aln, valid, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
