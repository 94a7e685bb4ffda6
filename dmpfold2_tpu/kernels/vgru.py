"""Pallas TPU kernel: fused 2-layer vertical-GRU scan over MSA rows.

The MSA reduction (reference: dmpfold/network.py:224-225 — a cuDNN GRU over
up to 3000 alignment rows, keeping only the final hidden state) is the one
long sequential loop in the pipeline. The `lax.scan` implementation
dispatches ~6 small ops per row and round-trips the hidden state (and the
3×H recurrent weights) through HBM every row; this kernel fuses the whole
scan:

  * grid = (column_tiles, row_chunks), rows innermost: TPU grid steps run
    sequentially on the core, so the (tile, H) hidden states of both layers
    live in VMEM scratch across the whole scan and the weights are fetched
    into VMEM once. Columns (residue positions — of one target or of a
    whole batch, flattened) are independent, so tiles don't interact.
  * the network's input is one-hot (22 classes), so layer 0's input
    projection is NOT materialized as an (N, L, 3H) tensor (14 GB at the
    long-target stress shape) — the kernel builds the one-hot for one
    streamed row of alignment indices and hits the MXU with a (tile,22)
    x (22,3H) matmul,
  * the recurrent matmuls ((tile,H) x (H,3H)) run back-to-back on the MXU
    with gates fused in-register on the VPU,
  * per-COLUMN valid lengths freeze each column's hidden state at its own
    true alignment depth — this is what lets one kernel invocation serve a
    whole shape-bucket batch (columns = B·L positions, each target with its
    own nseqs), recovering the kernel win in the throughput path instead of
    serializing under vmap (VERDICT round-1 item 9).

Off-TPU callers must pass ``interpret=True`` (tests do); production impl
selection (pallas on TPU, lax.scan elsewhere) lives in engine/fold.py and
parallel/stream.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.aln import NUM_CLASSES  # single source of the 22-class alphabet


ROW_CHUNK = 8  # rows per grid step (TPU block tiling needs sublane multiples of 8)


def _kernel(valid_ref, aln_ref, wi1_ref, wh1_ref, wi2_ref, wh2_ref,
            bi1_ref, bh1_ref, bi2_ref, bh2_ref, out_ref, h1_ref, h2_ref,
            *, hidden: int):
    chunk = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(chunk == 0)
    def _init():
        h1_ref[:] = jnp.zeros_like(h1_ref)
        h2_ref[:] = jnp.zeros_like(h2_ref)

    # (tile, 1) per-column true alignment depth — kept 2D throughout
    # (Mosaic cannot insert a minor dim on sub-32-bit vectors)
    valid = valid_ref[:, 0:1]

    def gru_gates(xp, hp, h):
        r = jax.nn.sigmoid(xp[:, :hidden] + hp[:, :hidden])
        z = jax.nn.sigmoid(xp[:, hidden : 2 * hidden] + hp[:, hidden : 2 * hidden])
        n = jnp.tanh(xp[:, 2 * hidden :] + r * hp[:, 2 * hidden :])
        return (1.0 - z) * n + z * h

    # ROW_CHUNK sequential rows per grid step (unrolled; amortizes grid
    # overhead and satisfies the (8, 128) block tiling constraint on the
    # int32 alignment slice)
    for r in range(ROW_CHUNK):
        h1 = h1_ref[:]
        h2 = h2_ref[:]
        # layer 0: one-hot the streamed row in-register, project on the MXU
        row = aln_ref[r]  # (tile,) int32
        onehot = jnp.asarray(
            row[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, NUM_CLASSES), 1),
            jnp.float32,
        )
        xp1 = jnp.dot(onehot, wi1_ref[:], preferred_element_type=jnp.float32) + bi1_ref[:]
        hp1 = jnp.dot(h1, wh1_ref[:], preferred_element_type=jnp.float32) + bh1_ref[:]
        h1_new = gru_gates(xp1, hp1, h1)

        # layer 1: input = layer 0's fresh state
        xp2 = jnp.dot(h1_new, wi2_ref[:], preferred_element_type=jnp.float32) + bi2_ref[:]
        hp2 = jnp.dot(h2, wh2_ref[:], preferred_element_type=jnp.float32) + bh2_ref[:]
        h2_new = gru_gates(xp2, hp2, h2)

        # freeze each column past the true end of ITS alignment
        keep = chunk * ROW_CHUNK + r < valid            # (tile, 1)
        h1_ref[:] = jnp.where(keep, h1_new, h1)
        h2_ref[:] = jnp.where(keep, h2_new, h2)

    @pl.when(chunk == n_chunks - 1)
    def _emit():
        out_ref[:] = h2_ref[:]


def _pick_tile(n_cols: int, max_tile: int = 256) -> int:
    """Column-tile width; callers pad n_cols up to a multiple of it.

    Padding (rather than requiring a divisor) keeps tiles wide for awkward
    lengths — a prime n_cols would otherwise degrade to 1-column tiles,
    orders of magnitude slower than the scan this kernel replaces.
    """
    if n_cols <= max_tile:
        return -(-n_cols // 8) * 8  # one 8-aligned tile
    return max_tile


@partial(jax.jit, static_argnames=("interpret",))
def vgru_final_cols_pallas(layers, aln_cols, col_valid, *, interpret: bool = False):
    """Fused MSA-row GRU over independent columns.

    ``aln_cols``: (n_rows, n_cols) int alignment, columns = residue positions
    (possibly of many targets flattened). ``col_valid``: (n_cols,) per-column
    true row count. Returns the (n_cols, H) final hidden state of layer 2.
    """
    assert len(layers) == 2, "kernel is specialized for the reference's 2-layer vgru"
    n_rows, n_cols = aln_cols.shape
    hidden = layers[0]["wh"].shape[0]
    assert layers[0]["wi"].shape[0] == NUM_CLASSES

    tile = _pick_tile(n_cols)

    # pad columns to a tile multiple (padded columns carry valid=0, so their
    # state stays frozen at zero) and rows to a ROW_CHUNK multiple (padded
    # rows freeze the state anyway)
    n_cols_pad = -(-n_cols // tile) * tile
    col_valid = jnp.asarray(col_valid, jnp.int32)
    aln = aln_cols.astype(jnp.int32)
    if n_cols_pad != n_cols:
        aln = jnp.pad(aln, ((0, 0), (0, n_cols_pad - n_cols)))
        col_valid = jnp.pad(col_valid, (0, n_cols_pad - n_cols))
    n_rows_pad = -(-n_rows // ROW_CHUNK) * ROW_CHUNK
    if n_rows_pad != n_rows:
        aln = jnp.pad(aln, ((0, n_rows_pad - n_rows), (0, 0)))

    out = pl.pallas_call(
        partial(_kernel, hidden=hidden),
        grid=(n_cols_pad // tile, n_rows_pad // ROW_CHUNK),
        in_specs=[
            # per-column valid, shipped as (n_cols, 8) so the kernel reads a
            # native (tile, 1) column vector
            pl.BlockSpec((tile, 8), lambda t, c: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_CHUNK, tile), lambda t, c: (c, t),
                         memory_space=pltpu.VMEM),             # alignment row chunk
            pl.BlockSpec(memory_space=pltpu.VMEM),             # wi1
            pl.BlockSpec(memory_space=pltpu.VMEM),             # wh1
            pl.BlockSpec(memory_space=pltpu.VMEM),             # wi2
            pl.BlockSpec(memory_space=pltpu.VMEM),             # wh2
            pl.BlockSpec(memory_space=pltpu.VMEM),             # bi1
            pl.BlockSpec(memory_space=pltpu.VMEM),             # bh1
            pl.BlockSpec(memory_space=pltpu.VMEM),             # bi2
            pl.BlockSpec(memory_space=pltpu.VMEM),             # bh2
        ],
        out_specs=pl.BlockSpec((tile, hidden), lambda t, i: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_cols_pad, hidden), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile, hidden), jnp.float32),
            pltpu.VMEM((tile, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.broadcast_to(col_valid[:, None], (n_cols_pad, 8)),
        aln,
        layers[0]["wi"], layers[0]["wh"], layers[1]["wi"], layers[1]["wh"],
        layers[0]["bi"], layers[0]["bh"], layers[1]["bi"], layers[1]["bh"],
    )
    return out[:n_cols]


def vgru_final_pallas(layers, alnmat, valid_len, *, interpret: bool = False):
    """Single-target wrapper: (N, L) int alignment -> (L, H) final state."""
    n_rows, batch = alnmat.shape
    col_valid = jnp.full((batch,), jnp.asarray(valid_len, jnp.int32))
    return vgru_final_cols_pallas(layers, alnmat, col_valid, interpret=interpret)
