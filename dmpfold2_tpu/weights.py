"""Checkpoint converter: reference PyTorch state-dict -> our parameter pytree.

The released DMPfold2 weights ship as two torch ``.pt`` state-dict shards
(reference: dmpfold/predict.py:88-92 merges part1+part2). This module maps
those tensors — torch layouts and names — onto the JAX pytree used by
:mod:`dmpfold2_tpu.models.gruresnet`:

  * GRU ``weight_ih_l{k}(_reverse)`` (3H, in) -> transposed ``wi`` (in, 3H);
    gate order r, z, n is preserved (our cells use the same convention).
  * Conv weights OIHW -> HWIO.
  * ``cSE.fc.*`` linear weights (out, in) -> transposed.
  * The frozen one-hot ``embed.weight`` is dropped (we one-hot directly).
  * The 16 residual blocks are stacked along a leading axis for lax.scan.

Accepts numpy arrays or torch tensors (torch is only imported if needed).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _to_np(v):
    if isinstance(v, np.ndarray):
        return v
    return v.detach().cpu().numpy()  # torch tensor


def _gru_layer(sd, prefix: str, layer: int, suffix: str = ""):
    return {
        "wi": jnp.asarray(_to_np(sd[f"{prefix}.weight_ih_l{layer}{suffix}"]).T),
        "wh": jnp.asarray(_to_np(sd[f"{prefix}.weight_hh_l{layer}{suffix}"]).T),
        "bi": jnp.asarray(_to_np(sd[f"{prefix}.bias_ih_l{layer}{suffix}"])),
        "bh": jnp.asarray(_to_np(sd[f"{prefix}.bias_hh_l{layer}{suffix}"])),
    }


def _bigru_stack(sd, prefix: str, num_layers: int):
    return [
        {
            "fwd": _gru_layer(sd, prefix, l),
            "bwd": _gru_layer(sd, prefix, l, "_reverse"),
        }
        for l in range(num_layers)
    ]


def _conv_hwio(v):
    return jnp.asarray(np.transpose(_to_np(v), (2, 3, 1, 0)))


def _maxout(sd, prefix: str):
    return {
        "w": _conv_hwio(sd[f"{prefix}.lin.weight"]),
        "b": jnp.asarray(_to_np(sd[f"{prefix}.lin.bias"])),
        "gamma": jnp.asarray(_to_np(sd[f"{prefix}.norm.weight"])),
        "beta": jnp.asarray(_to_np(sd[f"{prefix}.norm.bias"])),
    }


def _block(sd, idx: int):
    p = f"resnet.{idx}"
    return {
        "maxout": _maxout(sd, f"{p}.layer1"),
        "scse": {
            "cse_w1": jnp.asarray(_to_np(sd[f"{p}.scSE.cSE.fc.0.weight"]).T),
            "cse_w2": jnp.asarray(_to_np(sd[f"{p}.scSE.cSE.fc.2.weight"]).T),
            "sse_w": _conv_hwio(sd[f"{p}.scSE.sSE.conv.weight"]),
            "sse_b": jnp.asarray(_to_np(sd[f"{p}.scSE.sSE.conv.bias"])),
        },
    }


def convert_state_dict(sd, num_blocks: int = 16):
    """Reference-named state dict -> GRUResNet parameter pytree."""
    import jax

    blocks = [_block(sd, i + 1) for i in range(num_blocks)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "vgru": [_gru_layer(sd, "vgru", l) for l in range(2)],
        "hgru": _bigru_stack(sd, "hgru", 2),
        "trunk": {
            "input": _maxout(sd, "resnet.0"),
            "blocks": stacked,
            "out_w": _conv_hwio(sd[f"resnet.{num_blocks + 1}.weight"]),
            "out_b": jnp.asarray(_to_np(sd[f"resnet.{num_blocks + 1}.bias"])),
        },
        "coord_gru": _bigru_stack(sd, "coord_gru", 3),
        "coord_fc": jnp.asarray(_to_np(sd["coord_fc.weight"]).T),
    }


def save_params(path: str, params, extra: dict | None = None) -> None:
    """Save a parameter pytree as a flat ``.npz`` (native checkpoint format).

    Atomic: written to a temp file then renamed, so a crash/preemption mid-
    save can't truncate the best-val/best-train checkpoint a warm restart
    depends on. (np.savez appends .npz to bare paths; writing to the temp
    name explicitly keeps the final path exactly as given.)

    ``extra``: metadata arrays stored under their own keys (use a ``__``
    prefix so they can never collide with tree keys, which all start with
    ``[``); loaders that rebuild the tree ignore them.
    """
    import os

    import jax

    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    arrays = {jax.tree_util.keystr(kp): np.asarray(v) for kp, v in flat}
    if extra:
        arrays.update({k: np.asarray(v) for k, v in extra.items()})
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def load_params(path: str):
    """Load a ``.npz`` saved by :func:`save_params` back into the pytree."""
    import jax

    data = np.load(path)
    # rebuild a skeleton matching the stored architecture (hyperparameters
    # inferred from array shapes, so non-default widths round-trip too)
    from .models.gruresnet import init_params

    width = int(data["['coord_fc']"].shape[0])
    blocks_gamma = data["['trunk']['blocks']['maxout']['gamma']"]
    num_blocks, cwidth = int(blocks_gamma.shape[0]), int(blocks_gamma.shape[1])
    # only the pytree STRUCTURE is needed: eval_shape avoids running the
    # (device-side) random initialization just to build a skeleton
    skeleton = jax.eval_shape(
        lambda k: init_params(k, width, cwidth, num_blocks), jax.random.PRNGKey(0)
    )
    flat, treedef = jax.tree_util.tree_flatten_with_path(skeleton)
    leaves = [jnp.asarray(data[jax.tree_util.keystr(kp)]) for kp, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_torch_checkpoint(paths):
    """Load and merge torch ``.pt`` shard(s), then convert.

    ``paths``: iterable of file paths (merged in order, later overriding).
    """
    import torch

    sd = {}
    for p in paths:
        sd.update(torch.load(p, map_location="cpu", weights_only=True))
    return convert_state_dict(sd)
