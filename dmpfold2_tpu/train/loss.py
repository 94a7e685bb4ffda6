"""Training losses: TM-score via Kabsch superposition, confidence and steric terms.

Mask-aware restatement of the reference loss math (reference:
dmpfold/train.py:207-225 tmscore, 303-346 loss assembly). All functions take
true sizes so padded batches train identically to exact shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

COV_DIST = 3.78


def tmscore(target_atoms, pred_atoms, n_atoms=None):
    """Per-atom TM-score terms after optimal superposition.

    Args:
      target_atoms, pred_atoms: (A, 3) flattened 5-atoms-per-residue coords.
      n_atoms: true atom count (traced ok); padding rows must be masked by
               the caller's coords being arbitrary — they get zero weight.
    Returns (A,) per-atom TM terms (padded entries meaningless).
    """
    a_pad = target_atoms.shape[0]
    if n_atoms is None:
        n_atoms = a_pad
    n_atoms_f = jnp.asarray(n_atoms, jnp.float32)
    mask = (jnp.arange(a_pad) < n_atoms)[:, None]

    p = jnp.where(mask, target_atoms, 0.0)
    q = jnp.where(mask, pred_atoms, 0.0)
    p = jnp.where(mask, p - jnp.sum(p, 0) / n_atoms_f, 0.0)
    q = jnp.where(mask, q - jnp.sum(q, 0) / n_atoms_f, 0.0)

    cov = p.T @ q  # (3, 3)
    u, _, vt = jnp.linalg.svd(cov)
    v = vt.T
    det = jnp.linalg.det(v @ u.T)
    d = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(det)
    rot = v @ d @ u.T

    diffs = p @ rot.T - q
    d0sq = (jnp.cbrt(1.24 * n_atoms_f / 5.0 - 15.0) - 1.8) ** 2
    return 1.0 / (1.0 + jnp.sum(jnp.square(diffs), axis=1) / d0sq)


def steric_loss(ca_coords, nres=None):
    """CA stereochemistry penalty (reference: train.py:336-339)."""
    l_pad = ca_coords.shape[0]
    if nres is None:
        nres = l_pad
    idx = jnp.arange(l_pad)
    valid = idx < nres

    diffs = ca_coords[:, None, :] - ca_coords[None, :, :]
    dsq = jnp.sum(jnp.square(diffs), axis=2)
    pair_valid = valid[:, None] & valid[None, :]
    triu = (idx[None, :] - idx[:, None]) >= 2  # diagonal=2
    clash = jnp.sum(jnp.where(triu & pair_valid, jax.nn.relu(9.0 - dsq), 0.0))

    adj_valid = idx[:-1] + 1 < nres
    # the 1e-16 floor inside sqrt keeps the backward pass finite at
    # coincident CAs (sqrt'(0) = inf); its output is already >= 1e-8
    adj_d = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(ca_coords[1:] - ca_coords[:-1]), 1), 1e-16))
    bond = jnp.sum(jnp.where(adj_valid, jnp.square(adj_d - COV_DIST), 0.0)) / 64.0

    return jnp.tanh(clash + bond)


def fold_loss(pred_coords, confs, target_coords, nres=None):
    """Total loss (reference: train.py:330-341).

    Args:
      pred_coords:   (L, 5, 3) predicted atoms.
      confs:         (L,) predicted per-residue confidence.
      target_coords: (L, 5, 3) ground truth.
      nres: true residue count.
    Returns (loss, metrics dict).
    """
    l_pad = pred_coords.shape[0]
    if nres is None:
        nres = l_pad
    nres_f = jnp.asarray(nres, jnp.float32)
    n_atoms = 5 * jnp.asarray(nres)

    tms = tmscore(target_coords.reshape(-1, 3), pred_coords.reshape(-1, 3), n_atoms)
    atom_mask = jnp.arange(5 * l_pad) < n_atoms
    coord_loss = jnp.sum(jnp.where(atom_mask, 1.0 - tms, 0.0)) / (5.0 * nres_f)

    res_mask = jnp.arange(l_pad) < nres
    tm_ca = jax.lax.stop_gradient(tms[1::5])  # CA atoms
    conf_loss = jnp.sum(jnp.where(res_mask, jnp.abs(confs - tm_ca), 0.0)) / nres_f

    steric = steric_loss(pred_coords[:, 1, :], nres)

    loss = coord_loss + conf_loss + 0.02 * steric
    metrics = {
        "loss": loss,
        "coord_loss": coord_loss,
        "conf_loss": conf_loss,
        "steric_loss": steric,
        "tm_ca": jnp.sum(jnp.where(res_mask, tms[1::5], 0.0)) / nres_f,
    }
    return loss, metrics
