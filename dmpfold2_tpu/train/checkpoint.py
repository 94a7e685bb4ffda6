"""Checkpoint / warm-restart: the reference's 3-file scheme, TPU-native.

Reference (dmpfold/train.py:249-281, 402-418): per epoch save best-val
(`fullmap_e2e_model.pt`), best-train (`..._train.pt`), and `checkpoint.pt`
holding epoch/optimizer/scaler/minima; warm restart does a shape-filtered
partial state-dict load so training survives architecture tweaks.

Here: params as flat ``.npz`` (weights.save_params), optimizer state + scalars
pickled alongside. The shape-filtered partial restore keeps the reference's
restartability across model edits.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp

from .. import weights as weights_mod

BEST_VAL = "fullmap_e2e_model.npz"
BEST_TRAIN = "fullmap_e2e_model_train.npz"
LATEST = "latest_model.npz"
CHECKPOINT = "checkpoint.pkl"


def save_params(path: str, params) -> None:
    weights_mod.save_params(path, params)


def partial_restore(params, path: str):
    """Load a params .npz, keeping only shape-matching leaves (train.py:261-262).

    Restored leaves are cast to the skeleton's dtype so a checkpoint written
    under a different storage dtype can't silently produce a mixed-dtype
    parameter tree (which would change jit signatures and optimizer
    promotion rules without any report).
    """
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    leaves = []
    n_loaded = 0
    for kp, leaf in flat:
        key = jax.tree_util.keystr(kp)
        if key in data and data[key].shape == leaf.shape:
            leaves.append(jnp.asarray(data[key], dtype=leaf.dtype))
            n_loaded += 1
        else:
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves), n_loaded


def save_train_state(workdir: str, epoch: int, opt_state, val_err_min: float,
                     train_err_min: float, params=None) -> None:
    """Rolling checkpoint. ``params`` (when given) is saved alongside as
    LATEST — the optimizer moments (and any mid-accumulation MultiSteps
    gradient buffer) are only meaningful with the params they were computed
    against, so resume must restore BOTH, not opt_state over best-train or
    fresh random weights."""
    if params is not None:
        # stamp the epoch into the params file: a crash between the two
        # writes would otherwise silently pair epoch-N params with epoch-N-1
        # optimizer state at resume (loop.py warns on mismatch)
        weights_mod.save_params(os.path.join(workdir, LATEST), params,
                                extra={"__epoch__": np.int64(epoch)})
    state = {
        "epoch": epoch,
        "opt_state": jax.tree.map(np.asarray, opt_state),
        "val_err_min": val_err_min,
        "train_err_min": train_err_min,
    }
    tmp = os.path.join(workdir, CHECKPOINT + ".tmp")
    with open(tmp, "wb") as fh:
        pickle.dump(state, fh)
    os.replace(tmp, os.path.join(workdir, CHECKPOINT))


def load_train_state(workdir: str):
    path = os.path.join(workdir, CHECKPOINT)
    if not os.path.isfile(path):
        return None
    with open(path, "rb") as fh:
        return pickle.load(fh)
