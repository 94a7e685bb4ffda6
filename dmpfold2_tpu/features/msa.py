"""MSA featurization: one-hot encoding and sequence reweighting.

TPU-first reformulation of the reference math (reference: dmpfold/predict.py:32-37,
136-137). Everything is shape-static and mask-aware so the same compiled
program serves any (nseqs, nres) up to the padded bucket shape:

  * ``msa_one_hot`` merges the gap class (21) into the ambiguous class (20)
    exactly as ``one_hot(clamp(aln, max=20), 21)`` does, and zeroes rows /
    residue columns beyond the true (nseqs, nres) so padding contributes
    nothing downstream.
  * ``reweight`` computes the pairwise-identity count matrix as a single
    MXU matmul with fp32 accumulation (counts are integers; bf16
    accumulation would corrupt the > cutoff comparison).

With ``nseqs == n_pad`` and ``nres == l_pad`` the results are bit-identical
to the unmasked formulas.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..parallel.sharding import shard_rows

NUM_DCA_CLASSES = 21  # 20 aa + merged ambiguous/gap class


def valid_masks(shape, nseqs, nres):
    """Row and residue-column validity masks for a padded (N, L) alignment."""
    n_pad, l_pad = shape
    row_mask = jnp.arange(n_pad) < nseqs
    col_mask = jnp.arange(l_pad) < nres
    return row_mask, col_mask


def msa_one_hot(alnmat, nseqs, nres):
    """(N, L) int -> (N, L, 21) float32 one-hot with gap merged into class 20.

    Padding rows/columns are zeroed.
    """
    n_pad, l_pad = alnmat.shape
    clamped = jnp.minimum(alnmat.astype(jnp.int32), 20)
    oh = jnp.asarray(clamped[..., None] == jnp.arange(NUM_DCA_CLASSES), jnp.float32)
    row_mask, col_mask = valid_masks((n_pad, l_pad), nseqs, nres)
    # MSA rows shard over the 'seq' mesh axis when a sharding context is
    # active: reweight's NxN identity matmul and DCA's covariance reduce
    # over rows, so GSPMD turns them into partial matmuls + psum.
    return shard_rows(oh * row_mask[:, None, None] * col_mask[None, :, None])


def reweight(msa1hot, nres, cutoff: float = 0.8):
    """Per-sequence weights: 1 / #sequences sharing > cutoff identity.

    ``msa1hot`` is a padded, masked (N, L, 21) one-hot; ``nres`` is the true
    residue count (the identity threshold is ``cutoff * nres``). Padded rows
    get weight zero.
    """
    n_pad = msa1hot.shape[0]
    flat = msa1hot.reshape(n_pad, -1)
    # identity counts: exact integers, accumulate in fp32 on the MXU
    id_mtx = jnp.dot(flat, flat.T, preferred_element_type=jnp.float32)
    id_min = jnp.asarray(nres, jnp.float32) * cutoff
    neighbors = jnp.sum(jnp.asarray(id_mtx > id_min, jnp.float32), axis=-1)
    # padded rows are all-zero => zero neighbors; guard the divide and mask
    row_valid = jnp.sum(flat, axis=-1) > 0
    w = jnp.where(row_valid, 1.0 / jnp.maximum(neighbors, 1.0), 0.0)
    return w
