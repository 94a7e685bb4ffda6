"""Pallas TPU kernel: fused 2-layer vertical-GRU scan over MSA rows.

The MSA reduction (reference: dmpfold/network.py:224-225 — a cuDNN GRU over
up to 3000 alignment rows, keeping only the final hidden state) is the one
long sequential loop in the pipeline. The `lax.scan` implementation
dispatches ~6 small ops per row; this kernel fuses the whole scan:

  * grid = (n_rows,): TPU grid steps run sequentially on the core, so the
    (L, H) hidden states of both layers live in VMEM scratch across steps,
  * layer-0 input projections (the only x-dependent matmul) are precomputed
    outside as one large MXU matmul over all rows; the kernel streams one
    row-slice per grid step from HBM with Pallas' automatic double-buffered
    pipelining,
  * the three recurrent matmuls per row ((L,H)x(H,3H)) run back-to-back on
    the MXU with gates fused in-register on the VPU,
  * masking freezes the hidden state for rows >= valid_len, so the emitted
    state is exactly the state at the true end of the alignment (identical
    semantics to models.gru.unigru_stack_final).

Falls back to interpret mode off-TPU (tests run it on CPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def _kernel(valid_ref, xp_ref, wh1_ref, wi2_ref, wh2_ref, bi2_ref, bh1_ref,
            bh2_ref, out_ref, h1_ref, h2_ref, *, hidden: int):
    i = pl.program_id(0)
    n_rows = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        h1_ref[:] = jnp.zeros_like(h1_ref)
        h2_ref[:] = jnp.zeros_like(h2_ref)

    valid_len = valid_ref[0]
    h1 = h1_ref[:]
    h2 = h2_ref[:]

    def gru_gates(xp, hp, h):
        r = _sigmoid(xp[:, :hidden] + hp[:, :hidden])
        z = _sigmoid(xp[:, hidden : 2 * hidden] + hp[:, hidden : 2 * hidden])
        n = jnp.tanh(xp[:, 2 * hidden :] + r * hp[:, 2 * hidden :])
        return (1.0 - z) * n + z * h

    # layer 0: xproj streamed in, recurrent matmul on the MXU
    hp1 = jnp.dot(h1, wh1_ref[:], preferred_element_type=jnp.float32) + bh1_ref[:]
    h1_new = gru_gates(xp_ref[0], hp1, h1)

    # layer 1: input = layer 0's fresh state
    xp2 = jnp.dot(h1_new, wi2_ref[:], preferred_element_type=jnp.float32) + bi2_ref[:]
    hp2 = jnp.dot(h2, wh2_ref[:], preferred_element_type=jnp.float32) + bh2_ref[:]
    h2_new = gru_gates(xp2, hp2, h2)

    # freeze past the true end of the alignment
    keep = i < valid_len
    h1_ref[:] = jnp.where(keep, h1_new, h1)
    h2_ref[:] = jnp.where(keep, h2_new, h2)

    @pl.when(i == n_rows - 1)
    def _emit():
        out_ref[:] = h2_ref[:]


@partial(jax.jit, static_argnames=("interpret",))
def vgru_final_pallas(layers, x, valid_len, *, interpret: bool = False):
    """Fused (T, B, C) -> (B, H) final-state GRU, torch gate conventions.

    ``layers``: two unidirectional GRU layer params ({wi, wh, bi, bh}).
    Layer-0 input projection is done outside the kernel (one big matmul).
    """
    assert len(layers) == 2, "kernel is specialized for the reference's 2-layer vgru"
    n_rows, batch, _ = x.shape
    hidden = layers[0]["wh"].shape[0]

    xproj0 = (
        jnp.einsum("tbc,ch->tbh", x, layers[0]["wi"]) + layers[0]["bi"]
    ).astype(jnp.float32)

    out = pl.pallas_call(
        partial(_kernel, hidden=hidden),
        grid=(n_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # valid_len
            pl.BlockSpec((1, batch, 3 * hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),            # xproj0 row slice
            pl.BlockSpec(memory_space=pltpu.VMEM),            # wh1
            pl.BlockSpec(memory_space=pltpu.VMEM),            # wi2
            pl.BlockSpec(memory_space=pltpu.VMEM),            # wh2
            pl.BlockSpec(memory_space=pltpu.VMEM),            # bi2
            pl.BlockSpec(memory_space=pltpu.VMEM),            # bh1
            pl.BlockSpec(memory_space=pltpu.VMEM),            # bh2
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, hidden), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((batch, hidden), jnp.float32),
            pltpu.VMEM((batch, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(valid_len, jnp.int32).reshape(1),
        xproj0,
        layers[0]["wh"], layers[1]["wi"], layers[1]["wh"],
        layers[1]["bi"], layers[0]["bh"], layers[1]["bh"],
    )
    return out
