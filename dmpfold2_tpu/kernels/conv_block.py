"""Pallas TPU kernel: fused 5x5 conv + bias + maxout for the trunk blocks.

The residual trunk's hot op (reference: dmpfold/network.py:17-31 — conv2d to
4x channels followed by max-pooling over groups) is the dominant FLOP sink
(SURVEY §3.3). This kernel expresses the 5x5 conv as 25 shifted MXU matmuls
over a VMEM-resident row band and folds the bias add + maxout reduction into
the epilogue, so the 4x-channel conv intermediate never touches HBM.

Layout: grid over row bands of T rows; each step DMAs a (T+4)-row window of
the zero-padded input from HBM, compacts it into 5 dx-shifted 8-aligned 2D
buffers (5 relayout copies — v1 did 25 unaligned tile slices instead, which
cost ~40% of its runtime on the VPU), then accumulates

    acc[t*L + c, :] = sum_{dy,dx} shifted[dx][(t+dy)*L + c, :] @ W[dy, dx]

in fp32 via free 8-aligned row slices, applies bias, maxes over the 4 pool
groups and writes bf16.

Used only for the bf16 compute policy; correctness-tested against the XLA
path in interpret mode and benchmarked on hardware before being enabled.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KSIZE = 5
PAD = 2


def _perm_indices(c_out: int, pool: int):
    """old channel index for each new position: new layout has pool slice
    p at lanes [p*group, (p+1)*group), mapping new (p, g) <- old g*pool + p."""
    import numpy as np

    group = c_out // pool
    idx = np.empty((c_out,), np.int32)
    for p_idx in range(pool):
        for g in range(group):
            idx[p_idx * group + g] = g * pool + p_idx
    return idx


def _kernel(x_ref, w_ref, b_ref, *refs, t_rows: int, l_cols: int, l_al: int,
            c_in: int, c_out: int, pool: int, with_argmax: bool,
            with_stats: bool, n_win: int):
    if with_stats:
        nr_ref, j0_ref = refs[:2]
        refs = refs[2:]
        o_ref, stat_ref, win_ref, sem = refs[:4]
        sh_refs = refs[4:]
    elif with_argmax:
        o_ref, idx_ref, win_ref, sem = refs[:4]
        sh_refs = refs[4:]
    else:
        o_ref, win_ref, sem = refs[:3]
        sh_refs = refs[3:]
    i = pl.program_id(0)
    n_bands = pl.num_programs(0)

    # double-buffered window DMA (n_win=2): two slots in win_ref / sem so
    # band i+1's HBM->VMEM copy streams in underneath band i's compaction +
    # matmuls (the v1 kernel did start();wait() back-to-back — every band
    # stalled on its own copy). TPU grid steps run sequentially on one
    # core, so slot (i+1)%2's previous occupant (band i-1) was consumed
    # last step. n_win=1 keeps the serial copy for row widths where the
    # second window slot would overflow VMEM (the wrapper decides).
    def window_dma(slot, band):
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(band * t_rows, t_rows + 2 * PAD)],
            win_ref.at[slot], sem.at[slot])

    if n_win == 2:
        @pl.when(i == 0)
        def _():
            window_dma(0, 0).start()

        @pl.when(i + 1 < n_bands)
        def _():
            window_dma((i + 1) % 2, i + 1).start()

        window_dma(i % 2, i).wait()
        cur_win = win_ref.at[i % 2]
    else:
        dma = window_dma(0, i)
        dma.start()
        dma.wait()
        cur_win = win_ref.at[0]

    # Compact the window into ONE wide dx-interleaved 2D buffer: flat row
    # (r*l_al + c), lane block [dx*c_in, (dx+1)*c_in) holds window element
    # (r, c + dx). Because l_al is a multiple of 8, every dy-tile below is
    # an 8-aligned row slice — a free view — and the dx dimension is folded
    # into the matmul contraction (K = KSIZE*c_in): 5 MXU dots per band
    # instead of 25, so the fp32 accumulator is revisited 5x less.
    win_rows = t_rows + 2 * PAD
    (sh_ref,) = sh_refs
    for dx in range(KSIZE):
        sh_ref[:, dx * c_in : (dx + 1) * c_in] = cur_win[
            :, dx : dx + l_al, :].reshape(win_rows * l_al, c_in)

    acc = jnp.zeros((t_rows * l_al, c_out), jnp.float32)
    for dy in range(KSIZE):
        tile = sh_ref[pl.ds(dy * l_al, t_rows * l_al), :]
        acc = acc + jnp.dot(tile, w_ref[dy],
                            preferred_element_type=jnp.float32)
    acc = acc + b_ref[:]
    # maxout: the wrapper permutes output channels so each pool group is a
    # contiguous lane block (Mosaic cannot split the lane dim by reshape)
    group = c_out // pool
    out = acc[:, :group]
    if with_argmax:
        # which pool slice won, first-max-wins on ties (torch argmax order:
        # slice p ascending corresponds to old channels g*pool + p ascending)
        bidx = jnp.zeros((t_rows * l_al, group), jnp.int32)
    for p_idx in range(1, pool):
        sl = acc[:, p_idx * group : (p_idx + 1) * group]
        if with_argmax:
            bidx = jnp.where(sl > out, p_idx, bidx)
        out = jnp.maximum(out, sl)
    out3 = out.reshape(t_rows, l_al, group)
    o_ref[:] = out3[:, :l_cols].astype(o_ref.dtype)
    if with_argmax:
        idx_ref[:] = bidx.reshape(t_rows, l_al, group)[:, :l_cols]
    if with_stats:
        # masked InstanceNorm partial sums over this band (bands are
        # target-aligned: t_rows | stride, enforced by the wrapper). Valid
        # region is the square [0, nr)²; output tall row j0+rr is data row
        # j0+rr of its target. Cols >= l_cols (alignment pad) have col >= nr.
        nr = nr_ref[i]
        shape3 = (t_rows, l_al, group)
        row_j = j0_ref[i] + jax.lax.broadcasted_iota(jnp.int32, shape3, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, shape3, 1)
        valid = (row_j < nr) & (col < nr)
        masked = jnp.where(valid, out3, 0.0)
        s = jnp.sum(masked, axis=(0, 1))[None]
        ss = jnp.sum(masked * masked, axis=(0, 1))[None]
        # stats block is (1, 8, C) to satisfy the (8, 128) fp32 tile rule:
        # row 0 = sum, row 1 = sum of squares, rows 2-7 unused
        stat_ref[0] = jnp.concatenate(
            [s, ss, jnp.zeros((6, group), jnp.float32)], axis=0)


def _pick_band(l_cols: int, c_out: int, c_in: int, pool: int,
               with_argmax: bool, n_win: int = 1) -> int:
    """Largest row-band that fits the VMEM budget; 0 if even one row does
    not fit (callers must fall back to the XLA conv path then).

    ``n_win``: window-buffer slots. 2 = double-buffered DMA (band i+1's
    copy overlaps band i's compute); the wrapper prefers 2 and falls back
    to 1 only where the second slot would not fit (row widths near the
    VMEM ceiling).
    """
    # budget by total VMEM: fp32 accumulator + n_win window slots + the
    # dx-interleaved bf16 buffer + weights + output band, within ~12 MB of
    # the 16 MB VMEM
    l_al = -(-l_cols // 8) * 8
    w_win = -(-(l_al + 2 * PAD) // 8) * 8
    weights = KSIZE * KSIZE * c_in * c_out * 2
    # per output element: bf16 out (2 B) + int32 argmax residual (4 B) when
    # the training VJP asks for it
    out_bytes = 2 + (4 if with_argmax else 0)
    for t in (20, 16, 10, 8, 5, 4, 2, 1):
        acc = t * l_al * c_out * 4
        win = n_win * (t + 2 * PAD) * w_win * c_in * 2
        shifted = KSIZE * (t + 2 * PAD) * l_al * c_in * 2
        out = t * l_cols * (c_out // pool) * out_bytes
        if acc + win + shifted + weights + out <= 12 * 2 ** 20:
            return t
    return 0


def fused_fits(l_cols: int, c_out: int = 512, c_in: int = 128, pool: int = 4,
               with_argmax: bool = False) -> bool:
    """Whether the fused kernel can run at this shape (VMEM + tiling).

    Two gates, both hardware constraints the interpret-mode tests cannot
    see:

    * channel alignment — the dx-interleaved window slices and the output
      pool-group lane blocks require ``c_in`` and ``c_out/pool`` to be
      multiples of the 128-wide lane tiling. Mosaic rejects misaligned
      slices at compile time (measured: a width-32 experiment model fails
      with "Slice shape along dimension 2 must be aligned to tiling (128),
      but is 32" — caught by the round-4 hardware training-CLI drive);
      such small models keep the XLA conv path.
    * VMEM — the kernel holds one full output row (plus KSIZE dx-shifted
      input rows) resident, so beyond L ≈ 1000 even a one-row band
      overflows the 16 MB VMEM (measured: L=1536 fails Mosaic
      compilation). Those long targets are also exactly the regime served
      by seq-axis sharding.
    """
    if c_in % 128 != 0 or (c_out // pool) % 128 != 0:
        return False
    return _pick_band(l_cols, c_out, c_in, pool, with_argmax) > 0


def _divisor_band(tall: int, l_cols: int, c_out: int, c_in: int, pool: int,
                  with_argmax: bool) -> tuple[int, int]:
    """(band rows, window slots): double-buffered when the 2nd slot fits."""
    for n_win in (2, 1):
        budget = _pick_band(l_cols, c_out, c_in, pool, with_argmax, n_win)
        if budget > 0:
            for t in range(budget, 0, -1):
                if tall % t == 0:
                    return t, n_win
            return 1, n_win
    raise ValueError(
        f"fused conv band does not fit VMEM at row width {l_cols}; "
        "gate callers with kernels.conv_block.fused_fits()")


@partial(jax.jit, static_argnames=("pool", "interpret", "with_argmax",
                                   "with_stats"))
def conv5x5_maxout(x, w, b, pool: int = 4, nres=None, *,
                   interpret: bool = False, with_argmax: bool = False,
                   with_stats: bool = False):
    """Fused conv+bias+maxout: (B, L, L, C) x (5, 5, C, C*pool) -> (B, L, L, C/...).

    Batches are stacked into one tall image with the ±2 zero-pad rows between
    targets, which makes target boundaries exactly conv-boundary-equivalent —
    one kernel launch covers the whole batch (vmap cannot block an
    ANY-memory-space operand).

    ``with_argmax``: also return the winning pool-slice index per output
    element (int32, same shape as the output) — the residual the custom VJP
    needs to route gradients through the maxout without recomputing the
    4x-channel conv (see :func:`conv5x5_maxout_diff`).

    ``with_stats``: additionally return per-target masked InstanceNorm
    partial sums (sum, sum-of-squares per output channel, fp32) computed in
    the kernel epilogue over the valid [0, nres)² region — this removes the
    separate full-map statistics read from every trunk block (the stats
    never re-touch HBM). Requires ``nres`` (B,) int32 true sizes; bands are
    chosen to divide the per-target row stride so no band crosses a target
    boundary. Returns ``(out, sums, sumsqs)`` with sums/sumsqs (B, C/pool).
    Mutually exclusive with ``with_argmax`` (stats serve the inference
    path; training differentiates the unfused norm).
    """
    assert not (with_argmax and with_stats)
    batch, l_rows, l_cols, c_in = x.shape
    c_out = w.shape[-1]
    group = c_out // pool

    # permute output channels: torch groups are c = g*pool + p; put each
    # pool slice p in a contiguous lane block [p*group, (p+1)*group)
    perm = _perm_indices(c_out, pool)
    w = w[..., perm]
    b = b[perm]
    # fold dx into the contraction dim: (dy, dx, ci, co) -> (dy, dx*ci, co)
    # matching the kernel's dx-interleaved lane blocks
    w = w.reshape(KSIZE, KSIZE * c_in, c_out)

    # l_al: the dx-shifted buffers' width, 8-aligned so dy row-slices of
    # their 2D views are free; the window must fit dx + l_al columns
    l_al = -(-l_cols // 8) * 8
    w_win = -(-(l_al + 2 * PAD) // 8) * 8
    x_pad = jnp.pad(x.astype(jnp.bfloat16),
                    ((0, 0), (PAD, PAD), (PAD, w_win - PAD - l_cols), (0, 0)))
    stride = l_rows + 2 * PAD
    tall = batch * stride
    x_tall = x_pad.reshape(tall, w_win, c_in)
    # 2*PAD extra zero rows so the last band's window stays in bounds
    x_tall = jnp.pad(x_tall, ((0, 2 * PAD), (0, 0), (0, 0)))

    if with_stats:
        # bands must not cross target boundaries: pick t_rows | stride
        t_rows, n_win = _divisor_band(stride, l_cols, c_out, c_in, pool,
                                      with_argmax)
    else:
        t_rows, n_win = _divisor_band(tall, l_cols, c_out, c_in, pool,
                                      with_argmax)
    n_bands = tall // t_rows

    out_spec = pl.BlockSpec((t_rows, l_cols, group),
                            lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((tall, l_cols, group), jnp.bfloat16)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),      # padded tall input, HBM
        pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
    ]
    operands = [x_tall, w.astype(jnp.bfloat16), b.astype(jnp.float32)]
    if with_argmax:
        out_spec = [out_spec, out_spec]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((tall, l_cols, group), jnp.int32)]
    elif with_stats:
        if nres is None:
            nres = jnp.full((batch,), l_rows, jnp.int32)
        band_starts = jnp.arange(n_bands, dtype=jnp.int32) * t_rows
        nr_band = jnp.asarray(nres, jnp.int32)[band_starts // stride]
        j0_band = band_starts % stride
        # whole arrays in SMEM, indexed by program id (Mosaic requires
        # rank-1 blocks to cover the array or tile by 128)
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        operands += [nr_band, j0_band]
        stat_spec = pl.BlockSpec((1, 8, group), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        stat_shape = jax.ShapeDtypeStruct((n_bands, 8, group), jnp.float32)
        out_spec = [out_spec, stat_spec]
        out_shape = [out_shape, stat_shape]

    out = pl.pallas_call(
        partial(_kernel, t_rows=t_rows, l_cols=l_cols, l_al=l_al, c_in=c_in,
                c_out=c_out, pool=pool, with_argmax=with_argmax,
                with_stats=with_stats, n_win=n_win),
        grid=(n_bands,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((n_win, t_rows + 2 * PAD, w_win, c_in), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((n_win,)),
        ] + [
            pltpu.VMEM(((t_rows + 2 * PAD) * l_al, KSIZE * c_in),
                       jnp.bfloat16),
        ],
        interpret=interpret,
    )(*operands)
    # tall row k*stride + j is the conv output for target k's data row j
    untall = lambda a: a.reshape(batch, stride, l_cols, group)[:, :l_rows]
    if with_argmax:
        return untall(out[0]), untall(out[1])
    if with_stats:
        bands_per = stride // t_rows
        stats = out[1].reshape(batch, bands_per, 8, group).sum(axis=1)
        return untall(out[0]), stats[:, 0], stats[:, 1]
    return untall(out)


@partial(jax.jit, static_argnames=("pool", "interpret"))
def conv5x5_maxout_norm(x, w, b, gamma, beta, pool: int = 4, nres=None,
                        mask=None, *, eps: float = 1e-5,
                        interpret: bool = False):
    """Fully fused trunk-block front half: conv5x5 + bias + maxout +
    masked InstanceNorm (SURVEY §7 kernel plan (b); reference semantics
    dmpfold/network.py:17-31 + 19's InstanceNorm2d(affine)).

    The 4x-channel conv intermediate stays in VMEM (as in
    :func:`conv5x5_maxout`) and the norm statistics are computed in the
    kernel epilogue, so the conv output is read back from HBM exactly once
    (for the scale/shift application, which XLA fuses with the downstream
    SE/residual elementwise chain) instead of twice. Inference-only: the
    training path differentiates the unfused masked_instance_norm.

    Variance uses E[x²]−E[x]² on fp32 partials — post-maxout activations are
    O(1), so cancellation is negligible (validated against the two-pass norm
    in tests).
    """
    out, scale, shift = conv5x5_maxout_stats(x, w, b, gamma, beta, pool, nres,
                                             eps=eps, interpret=interpret)
    y = (out.astype(jnp.float32) * scale[:, None, None, :]
         + shift[:, None, None, :])
    if mask is not None:
        y = y * mask
    return y.astype(out.dtype)


@partial(jax.jit, static_argnames=("pool", "interpret"))
def conv5x5_maxout_stats(x, w, b, gamma, beta, pool: int = 4, nres=None, *,
                         eps: float = 1e-5, interpret: bool = False):
    """Like :func:`conv5x5_maxout_norm` but returns the RAW conv+maxout
    output plus the per-target affine ``(scale, shift)`` (both (B, C))
    that normalizes it, without applying them.

    This lets the caller defer the normalization into downstream consumers
    — e.g. absorb scale/shift into the SE block's 1×1 conv weights and the
    final gating elementwise — so the normalized tensor never materializes
    in HBM (models/trunk.py:resnet_block fused path).
    """
    out, s, ss = conv5x5_maxout(x, w, b, pool, nres, interpret=interpret,
                                with_stats=True)
    batch, l_rows = x.shape[0], x.shape[1]
    if nres is None:
        count = jnp.full((batch, 1), float(l_rows * l_rows), jnp.float32)
    else:
        nr_f = jnp.asarray(nres, jnp.float32)[:, None]
        count = jnp.maximum(nr_f * nr_f, 1.0)
    mean = s / count
    var = jnp.maximum(ss / count - mean * mean, 0.0)
    scale = (gamma * jax.lax.rsqrt(var + eps)).astype(jnp.float32)
    shift = beta - mean * scale
    return out, scale, shift


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv5x5_maxout_diff(x, w, b, pool: int = 4, interpret: bool = False):
    """Differentiable fused conv+bias+maxout.

    Primal (inference, no grads requested): identical to
    :func:`conv5x5_maxout` — same kernel, zero overhead. Under reverse-mode
    AD the forward additionally emits the argmax pool index, and the backward
    is hand-written XLA (reference semantics: torch routes the max gradient
    to the first-argmax element, dmpfold/network.py:29-31):

      * the cotangent is scattered into the 4x conv channels at the winning
        pool slice (old torch channel layout c = g*pool + p),
      * d/dx  = conv of the scattered cotangent with the spatially-flipped,
        in/out-transposed weights,
      * d/dw  = conv of the input with the cotangent via the batch<->feature
        swap trick, accumulated in fp32,
      * d/db  = spatial-and-batch sum.

    This keeps the 4x-channel conv intermediate out of HBM in both passes —
    under `jax.checkpoint` the recompute re-runs the fused kernel, and the
    backward does exactly two MXU convs (dx, dw) plus a cheap scatter, versus
    the unfused path's recomputed forward conv + two backward convs on a 4x
    HBM-materialized tensor.
    """
    return conv5x5_maxout(x, w, b, pool, interpret=interpret)


def _diff_fwd(x, w, b, pool, interpret):
    out, idx = conv5x5_maxout(x, w, b, pool, interpret=interpret,
                              with_argmax=True)
    # bank the pool index (0..pool-1) as int8: the residual lives across the
    # whole backward (x4 per recycle under training), and int32 would make
    # it the block's single largest saved tensor
    return out, (x, w, b, idx.astype(jnp.int8))


def _diff_bwd(pool, interpret, res, g):
    """Pool-decomposed backward: the 4x-channel scattered cotangent never
    materializes. For each pool slice p the masked cotangent
    ``gp = g * [idx==p]`` (old channel c = g_idx*pool + p) is group-wide,
    and

      * dx += conv(gp, flip(w[..., p::pool])^T)       — thin group->c_in conv
      * dw[..., p::pool] = 25 shifted (Cin, B*L*L) @ (B*L*L, group) GEMMs
      * db[p::pool] = spatial/batch sum of gp

    Probed against the 512-wide scattered forms at L=352 (scripts/
    probe_dx.py + a chained dw probe): dx 4.4 -> 2.9 ms in isolation AND
    in the full step (train 1.29 -> 1.20 s); dw+db 5.2 -> 2.8 ms in
    isolation but time-neutral in the full step (XLA already amortized
    the wide dw GEMMs there) — kept because it never materializes the
    512-wide cotangent, lowering the backward's peak memory. (The classic
    batch<->feature-swap dw conv is worse still, 13 ms — a pathological
    TPU path; and the 25-shifted-GEMM trick applied to dx is memory-bound
    at 6.7% of peak and loses.)
    """
    x, w, b, idx = res
    c_out = w.shape[-1]
    group = c_out // pool
    dims = ("NHWC", "HWIO", "NHWC")
    pad = ((PAD, PAD), (PAD, PAD))
    bsz, l1, l2, c_in = x.shape
    xp = jnp.pad(x.astype(jnp.bfloat16),
                 ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    gb = g.astype(jnp.bfloat16)
    dx = None
    dws, dbs = [], []
    for p_idx in range(pool):
        gp = jnp.where(idx == p_idx, gb, jnp.bfloat16(0))
        w_p = w[..., p_idx::pool]
        wp_hat = jnp.transpose(jnp.flip(w_p, (0, 1)),
                               (0, 1, 3, 2)).astype(jnp.bfloat16)
        d = jax.lax.conv_general_dilated(
            gp, wp_hat, (1, 1), pad, dimension_numbers=dims,
            preferred_element_type=jnp.float32)
        dx = d if dx is None else dx + d
        # db sums the UN-rounded cotangent (gp is bf16 for the MXU convs)
        dbs.append(jnp.sum(jnp.where(idx == p_idx, g, 0.0).astype(jnp.float32),
                           axis=(0, 1, 2)))
        g2 = gp.reshape(bsz * l1 * l2, group)
        taps = []
        for ky in range(KSIZE):
            for kx in range(KSIZE):
                xs = xp[:, ky : ky + l1, kx : kx + l2, :].reshape(
                    bsz * l1 * l2, c_in)
                taps.append(jnp.dot(xs.T, g2,
                                    preferred_element_type=jnp.float32))
        dws.append(jnp.stack(taps).reshape(KSIZE, KSIZE, c_in, group))
    # interleave the per-slice results back to old channel order g_idx*pool+p
    dw = jnp.stack(dws, axis=-1).reshape(KSIZE, KSIZE, c_in, c_out)
    db = jnp.stack(dbs, axis=-1).reshape(c_out)
    return dx.astype(x.dtype), dw.astype(w.dtype), db.astype(b.dtype)


conv5x5_maxout_diff.defvjp(_diff_fwd, _diff_bwd)
