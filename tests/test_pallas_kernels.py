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


def test_vgru_kernel_matches_scan(layers):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(20, 16, 22)), jnp.float32)
    ref = gru.unigru_stack_final(layers, x, valid_len=20)
    out = vgru_final_pallas(layers, x, 20, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_vgru_kernel_masked(layers):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(24, 16, 22)), jnp.float32)
    valid = 15
    ref = gru.unigru_stack_final(layers, x, valid_len=valid)
    out = vgru_final_pallas(layers, x, valid, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
