"""Parity of the fused Pallas refinement kernel vs the XLA reference path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dmpfold2_tpu.kernels.refine import refine_coords_pallas
from dmpfold2_tpu.models.geometry import refine_coords


def _random_chain(l, seed=0, scale=4.0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(l, 3)) * scale).astype(np.float32)


@pytest.mark.parametrize("l,steps", [(25, 20), (96, 100), (130, 7)])
def test_refine_kernel_matches_xla(l, steps):
    ca = _random_chain(l, seed=l)
    ref = np.asarray(refine_coords(jnp.asarray(ca), jnp.asarray(steps), l))
    ours = np.asarray(refine_coords_pallas(
        jnp.asarray(ca), jnp.asarray(steps), l, interpret=True))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_refine_kernel_padded_matches_unpadded():
    ca = _random_chain(40, seed=9)
    base = np.asarray(refine_coords_pallas(
        jnp.asarray(ca), jnp.asarray(30), 40, interpret=True))
    ca_pad = np.zeros((70, 3), np.float32)
    ca_pad[:40] = ca
    padded = np.asarray(refine_coords_pallas(
        jnp.asarray(ca_pad), jnp.asarray(30), 40, interpret=True))
    np.testing.assert_allclose(padded[:40], base, atol=1e-5)


def test_refine_kernel_zero_steps_identity():
    ca = _random_chain(33, seed=2)
    out = np.asarray(refine_coords_pallas(
        jnp.asarray(ca), jnp.asarray(0), 33, interpret=True))
    np.testing.assert_allclose(out, ca, atol=0)


def test_refine_kernel_traced_steps_no_recompile():
    """n_steps is a traced scalar: different values share one compilation."""
    ca = jnp.asarray(_random_chain(30, seed=5))
    f = jax.jit(lambda c, s: refine_coords_pallas(c, s, 30, interpret=True))
    a = np.asarray(f(ca, jnp.asarray(3)))
    b = np.asarray(f(ca, jnp.asarray(8)))
    ref_a = np.asarray(refine_coords(ca, jnp.asarray(3), 30))
    ref_b = np.asarray(refine_coords(ca, jnp.asarray(8), 30))
    np.testing.assert_allclose(a, ref_a, atol=1e-4)
    np.testing.assert_allclose(b, ref_b, atol=1e-4)
