"""GRUResNet: the end-to-end folding network (MSA -> coordinates + confidence).

TPU-native re-design of the reference model (reference: dmpfold/network.py:181-314):

  MSA rows --[2-layer GRU over rows, final state]--> per-residue embedding (L, 512)
  --[2-layer biGRU over residues]--> mat1d --outer product--> (L, L, 512)
  concat [pair | DCA 442 | dmap 1] -> 2D trunk -> distance map + confidence
  -> MDS eigendecomposition -> coords head (3-layer biGRU + linear)
  -> recycling (device-resident fori_loop, best-confidence tracking)
  -> CA refinement -> backbone completion.

The whole forward (including recycling and refinement) compiles to a single
XLA program; trip counts (nloops, refine_steps) are traced scalars so one
compilation serves every CLI setting at a given shape bucket.

Shapes are padded/masked: (n_pad, l_pad) are static bucket shapes, while
(nseqs, nres) are the true sizes. Outputs at padded positions are garbage and
must be sliced off by the caller.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import gru
from ..parallel.sharding import shard_pair
from .geometry import calpha_to_main_chain, mds_coords, refine_coords
from .trunk import NUM_DCA_CHANNELS, trunk_apply, trunk_params

from ..utils.aln import NUM_CLASSES as NUM_AA_CLASSES  # 22: the network embedding keeps all classes
WIDTH = 512
CWIDTH = 128


def init_params(key, width: int = WIDTH, cwidth: int = CWIDTH, num_blocks: int = 16):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "vgru": gru.unigru_stack_params(k1, 2, NUM_AA_CLASSES, width),
        "hgru": gru.bigru_stack_params(k2, 2, width, width // 2),
        "trunk": trunk_params(k3, NUM_DCA_CHANNELS + width + 1, cwidth, num_blocks),
        "coord_gru": gru.bigru_stack_params(k4, 3, width + 8, width // 2),
        "coord_fc": jax.random.uniform(
            k5, (width, 3), jnp.float32,
            -1.0 / jnp.sqrt(jnp.asarray(width, jnp.float32)),
            1.0 / jnp.sqrt(jnp.asarray(width, jnp.float32)),
        ),
    }


class TrunkHeads(NamedTuple):
    dm: jax.Array      # (L, L) raw distance-map channel
    conf: jax.Array    # (L,) per-residue confidence logits


def _trunk_heads(params, resinp, nres, pair_mask, row_mask, *, dropout_rng=None,
                 remat: bool = False, compute_dtype=None,
                 fused_conv: bool = False) -> TrunkHeads:
    out = trunk_apply(params["trunk"], resinp[None], pair_mask[None, :, :, None],
                      dropout_rng=dropout_rng, remat=remat,
                      compute_dtype=compute_dtype, fused_conv=fused_conv)[0]
    dm = out[:, :, 0]
    conf = jnp.sum(out[:, :, 1] * row_mask[None, :], axis=1) / nres
    return TrunkHeads(dm, conf)


def _bigru(layers, x, valid_len, rng, rgru_impl: str):
    """biGRU impl dispatch: Pallas sequence kernel (inference) or lax.scan.

    The Pallas path (kernels/rgru.py) has no dropout/VJP, so any time a
    dropout rng is present (training) the scan runs regardless of policy.
    """
    if rgru_impl == "pallas" and rng is None:
        from ..kernels.rgru import bigru_stack_pallas

        return bigru_stack_pallas(layers, x, valid_len)
    return gru.bigru_stack(layers, x, valid_len,
                           dropout_rate=0.1 if rng is not None else 0.0, rng=rng)


def _coords_head(params, mat1d, dm, nres, valid_len, *, dropout_rng=None,
                 canonical_signs: bool = True, rgru_impl: str = "scan",
                 mds_impl: str = "eigh"):
    mds = mds_coords(dm, nres, canonical_signs=canonical_signs, impl=mds_impl)
    coordembed = jnp.concatenate([mat1d, mds], axis=1)  # (L, 520)
    gru_out = _bigru(params["coord_gru"], coordembed[:, None, :], valid_len,
                     dropout_rng, rgru_impl)[:, 0, :]
    return gru_out @ params["coord_fc"]  # (L, 3)


def forward(params, alnmat, x2, nseqs, nres, nloops, refine_steps, *,
            rngs=None, remat: bool = False, compute_dtype=None,
            vgru_impl: str = "scan", fused_conv: bool = False,
            canonical_signs: bool = True, refine_impl: str = "xla",
            rgru_impl: str = "scan", mds_impl: str = "eigh",
            adaptive_recycle: bool = False, adaptive_patience: int = 2,
            with_aux: bool = False):
    """Run the full network.

    Args:
      params: pytree from :func:`init_params` (or the weights converter).
      alnmat: (n_pad, l_pad) int residue classes (0-21), right-padded.
      x2: (l_pad, l_pad, 443) pair features [DCA 442 | dmap seed 1], padded
          region zero.
      nseqs, nres: true sizes (scalars, may be traced).
      nloops, refine_steps: recycling iterations / refinement steps (traced).
      rngs: optional dict of PRNG keys enabling train-time dropout
            ({"hgru", "init", "recycle"}).
      remat: checkpoint the trunk blocks (training memory saver). The value
            "recycle" additionally checkpoints EACH recycle iteration (and
            the initial pass), so reverse-mode saves only the tiny recycle
            carry per iteration instead of every pass's trunk residuals —
            required for micro-batch >= 4 at crop 350, where (nloops+1)
            passes of block carries alone exceed HBM (train/step.py
            _resolve_remat picks; root-caused in scripts/bisect_batch4.py).
      adaptive_recycle: net-new opt-in (`-n auto`): treat the traced
            ``nloops`` as a cap and stop once the best mean confidence
            hasn't improved for ``adaptive_patience`` consecutive recycles.
      with_aux: also return {"iterations": <recycles actually run>}.

    Returns:
      coords (l_pad, 5, 3) and confidence (l_pad,) — valid through nres.
    """
    n_pad, l_pad = alnmat.shape
    remat_recycle = remat in ("recycle", "recycle_save_conv")
    if remat_recycle:
        # trunk-level mode under the per-iteration checkpoint: full-body
        # block remat, or "save_conv" (bank each block's conv+maxout output
        # inside the replayed pass so its backward skips the conv recompute
        # — the hybrid tier that makes micro-batch 2 beat 2x micro-batch 1
        # at crop 350; see train/step.py _resolve_remat)
        remat = "save_conv" if remat == "recycle_save_conv" else True
    row_mask = jnp.arange(l_pad) < nres
    pair_mask = row_mask[:, None] & row_mask[None, :]

    # --- MSA embedding: vertical GRU over rows, horizontal biGRU over residues
    if vgru_impl == "pallas":
        from ..kernels.vgru import vgru_final_pallas

        seq_embed = vgru_final_pallas(params["vgru"], alnmat, nseqs)  # (L, 512)
    else:
        x = jnp.asarray(alnmat[..., None] == jnp.arange(NUM_AA_CLASSES), jnp.float32)
        # training (remat): checkpoint the row scan in chunks — its
        # residuals otherwise dominate training memory at deep-MSA crops
        seq_embed = gru.unigru_stack_final(params["vgru"], x, valid_len=nseqs,
                                           remat_chunk=128 if remat else 0)
    hrng = rngs.get("hgru") if rngs else None
    mat1d = _bigru(params["hgru"], seq_embed[:, None, :], nres,
                   hrng, rgru_impl)[:, 0, :]
    mat1d = mat1d * row_mask[:, None]

    pair = mat1d[:, None, :] * mat1d[None, :, :]  # (L, L, 512)
    resinp_base = shard_pair(
        jnp.concatenate([pair, x2[:, :, :-1]], axis=2)
    )  # 954 channels

    def run_iteration(dmap_channel, dropout_rng=None):
        trunk_rng = coord_rng = None
        if dropout_rng is not None:
            trunk_rng, coord_rng = jax.random.split(dropout_rng)
        resinp = jnp.concatenate([resinp_base, dmap_channel[:, :, None]], axis=2)
        heads = _trunk_heads(params, resinp, nres, pair_mask, row_mask,
                             dropout_rng=trunk_rng, remat=remat,
                             compute_dtype=compute_dtype, fused_conv=fused_conv)
        ca = _coords_head(params, mat1d, heads.dm, nres, nres,
                          dropout_rng=coord_rng,
                          canonical_signs=canonical_signs,
                          rgru_impl=rgru_impl, mds_impl=mds_impl)
        return ca, heads.conf

    if remat_recycle:
        run_iteration = jax.checkpoint(run_iteration)

    # --- initial pass: dmap channel from x2 (template distances or -1 fill)
    rng0 = rngs.get("init") if rngs else None
    ca_coords, conf = run_iteration(x2[:, :, -1], rng0)
    ca_coords = refine_coords(ca_coords, refine_steps, nres, impl=refine_impl)
    best_conf, best_coords = conf, ca_coords
    best_mean = jnp.sum(conf * row_mask) / nres

    # --- recycling: feed predicted distances back as the last input channel
    def recycle_body(i, carry):
        ca, best_mean, best_conf, best_coords = carry
        diffs = ca[:, None, :] - ca[None, :, :]
        dmap = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(diffs), axis=2), 1e-8))
        dmap = dmap * pair_mask
        if rngs and rngs.get("recycle") is not None:
            it_rng = jax.random.fold_in(rngs["recycle"], i)
        else:
            it_rng = None
        ca_new, conf_new = run_iteration(dmap, it_rng)
        mean_new = jnp.sum(conf_new * row_mask) / nres
        better = mean_new > best_mean
        return (
            ca_new,
            jnp.where(better, mean_new, best_mean),
            jnp.where(better, conf_new, best_conf),
            jnp.where(better, ca_new, best_coords),
        )

    carry = (ca_coords, best_mean, best_conf, best_coords)
    iterations_used = nloops
    if isinstance(nloops, int):
        # static trip count (training: reverse-mode AD) — scan compiles the
        # recycle body once instead of unrolling nloops copies of the trunk
        if nloops > 0:
            def scan_body(c, i):
                return recycle_body(i, c), None
            if remat_recycle:
                # save only the recycle carry per iteration; the trunk pass
                # is replayed (with its own inner remat) in the backward
                scan_body = jax.checkpoint(scan_body)
            carry, _ = jax.lax.scan(scan_body, carry, jnp.arange(nloops))
    elif adaptive_recycle:
        # net-new opt-in mode (`-n auto`): recycle until the best mean
        # confidence stops improving for `patience` consecutive iterations,
        # capped at the traced `nloops`. Device-resident lax.while_loop —
        # no host round-trips; easy targets exit in 2-4 recycles instead
        # of paying the full fixed count.
        def cond(c):
            _, _, _, _, i, stall = c
            return jnp.logical_and(i < nloops, stall < adaptive_patience)

        def body_w(c):
            ca, bm, bc, bcoords, i, stall = c
            ca2, bm2, bc2, bcoords2 = recycle_body(i, (ca, bm, bc, bcoords))
            stall = jnp.where(bm2 > bm, 0, stall + 1)
            return (ca2, bm2, bc2, bcoords2, i + 1, stall)

        state = (*carry, jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
        state = jax.lax.while_loop(cond, body_w, state)
        carry, iterations_used = state[:4], state[4]
    else:
        carry = jax.lax.fori_loop(0, nloops, recycle_body, carry)
    _, _, best_conf, best_coords = carry

    best_coords = refine_coords(best_coords, refine_steps, nres, impl=refine_impl)
    coords_out = calpha_to_main_chain(best_coords, nres)
    if with_aux:
        return coords_out, jax.nn.sigmoid(best_conf), {
            "iterations": iterations_used}
    return coords_out, jax.nn.sigmoid(best_conf)


def forward_batched(params, alnmat, x2, nseqs, nres, nloops, refine_steps, *,
                    rngs=None, remat: bool = False,
                    compute_dtype=None, fused_conv: bool = False,
                    canonical_signs: bool = True, refine_impl: str = "xla",
                    vgru_impl: str = "scan", rgru_impl: str = "scan",
                    mds_impl: str = "eigh"):
    """Natively-batched forward: (B, N, L) alignments -> ((B, L, 5, 3), (B, L)).

    Equivalent to ``vmap(forward)`` but the trunk runs on the whole stacked
    batch (one conv per block instead of B mapped ones), which the Pallas
    fused conv kernel requires (it cannot be vmapped across its HBM operand)
    and which batches the GRU matmuls over B·L columns. Per-target sizes
    enter as (B,) vectors; masking semantics match the single-target path
    exactly (tested).

    Training support mirrors :func:`forward`: ``rngs`` ({"hgru", "init",
    "recycle"}) enables dropout (masks span the batch dim, so samples draw
    independent masks), ``remat`` checkpoints the trunk blocks, and a static
    int ``nloops`` switches recycling to a reverse-differentiable
    ``lax.scan`` — this is what lets the bf16 training step run the fused
    Pallas conv (kernels/conv_block.py has a custom VJP but no vmap rule).
    """
    batch, n_rows, l_pad = alnmat.shape
    remat_recycle = remat in ("recycle", "recycle_save_conv")
    if remat_recycle:
        # trunk-level mode under the per-iteration checkpoint: full-body
        # block remat, or "save_conv" (bank each block's conv+maxout output
        # inside the replayed pass so its backward skips the conv recompute
        # — the hybrid tier that makes micro-batch 2 beat 2x micro-batch 1
        # at crop 350; see train/step.py _resolve_remat)
        remat = "save_conv" if remat == "recycle_save_conv" else True
    row_mask = jnp.arange(l_pad)[None, :] < nres[:, None]           # (B, L)
    pair_mask = row_mask[:, :, None] & row_mask[:, None, :]          # (B, L, L)
    nres_f = jnp.asarray(nres, jnp.float32)

    # --- vertical GRU over MSA rows: columns = B*L residue positions, each
    # frozen at its own target's true depth
    col_valid = jnp.repeat(nseqs, l_pad)                             # (B*L,)
    if vgru_impl == "pallas":
        from ..kernels.vgru import vgru_final_cols_pallas

        aln_cols = jnp.transpose(alnmat, (1, 0, 2)).reshape(n_rows, batch * l_pad)
        seq_embed = vgru_final_cols_pallas(params["vgru"], aln_cols, col_valid)
    else:
        x = jnp.asarray(alnmat[..., None] == jnp.arange(NUM_AA_CLASSES), jnp.float32)
        x_cols = jnp.transpose(x, (1, 0, 2, 3)).reshape(n_rows, batch * l_pad, -1)
        seq_embed = gru.unigru_stack_final(params["vgru"], x_cols, valid_len=col_valid,
                                           remat_chunk=128 if remat else 0)
    seq_embed = seq_embed.reshape(batch, l_pad, -1)                  # (B, L, 512)

    # --- horizontal biGRU over residues: batch dim = targets
    hrng = rngs.get("hgru") if rngs else None
    hin = jnp.transpose(seq_embed, (1, 0, 2))                        # (L, B, 512)
    mat1d = _bigru(params["hgru"], hin, nres, hrng, rgru_impl)
    mat1d = jnp.transpose(mat1d, (1, 0, 2)) * row_mask[..., None]    # (B, L, 512)

    pair = mat1d[:, :, None, :] * mat1d[:, None, :, :]               # (B, L, L, 512)
    resinp_base = jnp.concatenate([pair, x2[..., :-1]], axis=3)      # (B, L, L, 954)

    def run_iteration(dmap_channel, dropout_rng=None):
        trunk_rng = coord_rng = None
        if dropout_rng is not None:
            trunk_rng, coord_rng = jax.random.split(dropout_rng)
        resinp = jnp.concatenate([resinp_base, dmap_channel[..., None]], axis=3)
        out = trunk_apply(params["trunk"], resinp, pair_mask[..., None],
                          dropout_rng=trunk_rng, remat=remat,
                          compute_dtype=compute_dtype, fused_conv=fused_conv)
        dm = out[..., 0]
        conf = jnp.sum(out[..., 1] * row_mask[:, None, :], axis=2) / nres_f[:, None]
        mds = jax.vmap(
            lambda d, nr: mds_coords(d, nr, canonical_signs=canonical_signs,
                                     impl=mds_impl)
        )(dm, nres)                                                  # (B, L, 8)
        coordembed = jnp.concatenate([mat1d, mds], axis=2)
        gru_out = _bigru(params["coord_gru"], jnp.transpose(coordembed, (1, 0, 2)),
                         nres, coord_rng, rgru_impl)
        ca = jnp.transpose(gru_out, (1, 0, 2)) @ params["coord_fc"]  # (B, L, 3)
        return ca, conf

    refine_b = jax.vmap(
        lambda c, s, nr: refine_coords(c, s, nr, impl=refine_impl),
        in_axes=(0, None, 0))

    if remat_recycle:
        run_iteration = jax.checkpoint(run_iteration)

    rng0 = rngs.get("init") if rngs else None
    ca_coords, conf = run_iteration(x2[..., -1], rng0)
    ca_coords = refine_b(ca_coords, refine_steps, nres)
    best_conf, best_coords = conf, ca_coords
    best_mean = jnp.sum(conf * row_mask, axis=1) / nres_f            # (B,)

    def recycle_body(i, carry):
        ca, best_mean, best_conf, best_coords = carry
        diffs = ca[:, :, None, :] - ca[:, None, :, :]
        dmap = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(diffs), axis=3), 1e-8))
        dmap = dmap * pair_mask
        if rngs and rngs.get("recycle") is not None:
            it_rng = jax.random.fold_in(rngs["recycle"], i)
        else:
            it_rng = None
        ca_new, conf_new = run_iteration(dmap, it_rng)
        mean_new = jnp.sum(conf_new * row_mask, axis=1) / nres_f
        better = mean_new > best_mean                                # (B,)
        return (
            ca_new,
            jnp.where(better, mean_new, best_mean),
            jnp.where(better[:, None], conf_new, best_conf),
            jnp.where(better[:, None, None], ca_new, best_coords),
        )

    carry = (ca_coords, best_mean, best_conf, best_coords)
    if isinstance(nloops, int):
        # static trip count: reverse-differentiable recycling (training)
        if nloops > 0:
            def scan_body(c, i):
                return recycle_body(i, c), None
            if remat_recycle:
                # save only the recycle carry per iteration; the trunk pass
                # is replayed (with its own inner remat) in the backward
                scan_body = jax.checkpoint(scan_body)
            carry, _ = jax.lax.scan(scan_body, carry, jnp.arange(nloops))
    else:
        carry = jax.lax.fori_loop(0, nloops, recycle_body, carry)
    _, _, best_conf, best_coords = carry

    best_coords = refine_b(best_coords, refine_steps, nres)
    coords_out = jax.vmap(calpha_to_main_chain)(best_coords, nres)
    return coords_out, jax.nn.sigmoid(best_conf)
