"""Pallas TPU kernel: fused residue-axis GRU sequence pass (hgru / coord_gru).

The reference's horizontal GRUs (reference: dmpfold/network.py:190,213,225,253
— a 2-layer biGRU producing the pair-embedding vector and a 3-layer biGRU in
the coordinate head) scan over residue positions with a tiny (B, H) hidden
state. As a `lax.scan` each of the 6-10 layer-direction passes dispatches a
small (B,256)x(256,768) matmul plus gate ops per step with the hidden state
round-tripping through HBM — at B=16, L=96 the coordinate head alone costs
~45 ms per recycle, rivalling the whole 2D trunk pass. This kernel runs one
layer-direction's entire time loop on-core:

  * the input projection ``x @ W_i + b_i`` for the whole sequence stays an
    XLA einsum (one large MXU matmul, done by the wrapper) — the kernel
    consumes the precomputed (T, B, 3H) projection streamed chunk-wise,
  * grid = (time_chunks,): TPU grid steps run sequentially, so the (B, H)
    hidden state lives in VMEM scratch across the whole pass and the
    recurrent weights are fetched once,
  * ``reverse=True`` streams the chunks (and writes output blocks) in
    reverse via the BlockSpec index map — no host-side flips,
  * per-batch-column valid lengths reproduce the scan masking semantics
    exactly: forward passes freeze a column's state at its true length,
    reverse passes hold it at zero until the first valid step.

Inference-only (no VJP); training keeps the `lax.scan` path which supports
dropout and reverse-mode AD. Off-TPU callers must pass ``interpret=True``
(tests do); impl selection lives in the engine policies.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TIME_CHUNK = 16  # timesteps per grid step (unrolled in-kernel)


def _kernel(valid_ref, xp_ref, wh_ref, bh_ref, out_ref, h_ref,
            *, hidden: int, reverse: bool):
    c = pl.program_id(0)
    n_chunks = pl.num_programs(0)

    @pl.when(c == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)

    valid = valid_ref[:, 0:1]  # (B, 1) per-column true length

    # chunk index in *time* order (reverse passes stream chunks backwards)
    tc = (n_chunks - 1 - c) if reverse else c

    steps = reversed(range(TIME_CHUNK)) if reverse else range(TIME_CHUNK)
    for r in steps:
        h = h_ref[:]
        xp = xp_ref[r]                                       # (B, 3H)
        hp = jnp.dot(h, wh_ref[:], preferred_element_type=jnp.float32) + bh_ref[:]
        rg = jax.nn.sigmoid(xp[:, :hidden] + hp[:, :hidden])
        zg = jax.nn.sigmoid(xp[:, hidden:2 * hidden] + hp[:, hidden:2 * hidden])
        ng = jnp.tanh(xp[:, 2 * hidden:] + rg * hp[:, 2 * hidden:])
        h_new = (1.0 - zg) * ng + zg * h

        keep = tc * TIME_CHUNK + r < valid                   # (B, 1)
        if reverse:
            h_new = jnp.where(keep, h_new, jnp.zeros_like(h_new))
        else:
            h_new = jnp.where(keep, h_new, h)
        h_ref[:] = h_new
        out_ref[r] = h_new


@partial(jax.jit, static_argnames=("reverse", "interpret"))
def gru_seq_pallas(wh, bh, xproj, col_valid, *, reverse: bool = False,
                   interpret: bool = False):
    """One GRU layer-direction over a precomputed input projection.

    ``xproj``: (T, B, 3H) fp32 ``x @ W_i + b_i``; ``col_valid``: (B,) true
    sequence lengths. Returns the (T, B, H) hidden sequence, matching
    :func:`dmpfold2_tpu.models.gru.gru_scan` bit-for-bit in fp32.
    """
    t_len, batch, three_h = xproj.shape
    hidden = three_h // 3
    xproj = xproj.astype(jnp.float32)

    # pad B to the 8-sublane granule and T to a chunk multiple; padded
    # timesteps sit past every column's valid length so the masking rules
    # already give scan-identical results on the true range
    b_pad = (-batch) % 8
    t_pad = (-t_len) % TIME_CHUNK
    if b_pad or t_pad:
        xproj = jnp.pad(xproj, ((0, t_pad), (0, b_pad), (0, 0)))
    valid = jnp.asarray(col_valid, jnp.int32)
    if b_pad:
        valid = jnp.pad(valid, (0, b_pad))
    bp = batch + b_pad
    n_chunks = (t_len + t_pad) // TIME_CHUNK

    if reverse:
        idx = lambda c: (n_chunks - 1 - c, 0, 0)
    else:
        idx = lambda c: (c, 0, 0)

    out = pl.pallas_call(
        partial(_kernel, hidden=hidden, reverse=reverse),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((bp, 8), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TIME_CHUNK, bp, three_h), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),           # wh
            pl.BlockSpec(memory_space=pltpu.VMEM),           # bh
        ],
        out_specs=pl.BlockSpec((TIME_CHUNK, bp, hidden), idx,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_len + t_pad, bp, hidden), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bp, hidden), jnp.float32)],
        interpret=interpret,
    )(
        jnp.broadcast_to(valid[:, None], (bp, 8)),
        xproj,
        jnp.asarray(wh, jnp.float32),
        jnp.asarray(bh, jnp.float32),
    )
    return out[:t_len, :batch]


def bigru_stack_pallas(layers, x, col_valid, *, interpret: bool = False):
    """Multi-layer biGRU over residues, Pallas sequence kernels per direction.

    Drop-in for :func:`dmpfold2_tpu.models.gru.bigru_stack` on the inference
    path (no dropout): ``x`` (T, B, C) -> (T, B, 2H). ``col_valid`` may be a
    scalar or a (B,) vector of per-target lengths.
    """
    t_len, batch, _ = x.shape
    valid = jnp.broadcast_to(jnp.asarray(col_valid, jnp.int32), (batch,))
    out = x
    for layer in layers:
        xf = jnp.einsum("tbc,ch->tbh", out, layer["fwd"]["wi"]) + layer["fwd"]["bi"]
        xb = jnp.einsum("tbc,ch->tbh", out, layer["bwd"]["wi"]) + layer["bwd"]["bi"]
        of = gru_seq_pallas(layer["fwd"]["wh"], layer["fwd"]["bh"], xf, valid,
                            reverse=False, interpret=interpret)
        ob = gru_seq_pallas(layer["bwd"]["wh"], layer["bwd"]["bh"], xb, valid,
                            reverse=True, interpret=interpret)
        out = jnp.concatenate([of, ob], axis=-1)
    return out
