"""The 2D residual trunk: Maxout conv blocks + squeeze-excitation, NHWC.

TPU-first re-design of the reference trunk (reference: dmpfold/network.py:12-103,
194-211): 1 input Maxout2d (955→128, pool 3), 16 identical residual blocks
(Dropout → Maxout2d 5×5 pool 4 → SCSE → residual add) and a final 1×1 conv to
2 channels (distance map + confidence).

Design choices:
  * NHWC activations / HWIO filters — the native TPU conv layout; all convs
    hit the MXU via ``conv_general_dilated``.
  * The 16 structurally-identical blocks are *stacked* into one pytree and
    applied with ``lax.scan`` — one compiled block body instead of 16 inlined
    copies (faster compiles, and `jax.checkpoint` on the body reproduces the
    reference's `checkpoint_sequential` memory behavior for training).
  * All ops are mask-aware so right-padded L×L maps produce bit-identical
    results to unpadded execution: inputs beyond the valid block are zero
    (indistinguishable from conv zero-padding at the true boundary), norm /
    SE statistics are computed over the valid region, and activations are
    re-masked after every bias/norm.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.norm import masked_instance_norm, masked_spatial_mean
from ..parallel.sharding import shard_pair

NUM_DCA_CHANNELS = 442
TRUNK_IN_CHANNELS = NUM_DCA_CHANNELS + 512 + 1  # 955
DEFAULT_WIDTH = 128
NUM_BLOCKS = 16

_DIMS = ("NHWC", "HWIO", "NHWC")
KSIZE_FUSED = 5


def _sharding_inactive() -> bool:
    from ..parallel.sharding import _active_spec

    return _active_spec() is None


def conv2d(x, w, b=None, dilation: int = 1, compute_dtype=None):
    """Same-padded 2D conv in NHWC/HWIO (matches torch's zero padding of
    dilation*(k-1)//2 for odd kernels).

    ``compute_dtype=bfloat16`` casts operands for the MXU and accumulates in
    fp32 (the TPU-native mixed-precision policy; replaces the reference's
    CUDA AMP autocast, train.py:318).
    """
    k = w.shape[0]
    pad = dilation * (k - 1) // 2
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    if w.dtype != x.dtype:
        w = w.astype(x.dtype)
    # bf16 policy: emit bf16 (MXU still accumulates fp32 internally) —
    # halves the HBM traffic of the 4x-channel maxout intermediate
    pref = jnp.float32 if compute_dtype is None else compute_dtype
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=_DIMS,
        preferred_element_type=pref,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def _xavier_uniform(key, shape, gain):
    # HWIO fan computation matches torch's for OIHW conv weights
    kh, kw, cin, cout = shape
    fan_in, fan_out = cin * kh * kw, cout * kh * kw
    bound = gain * jnp.sqrt(6.0 / (fan_in + fan_out))
    return _uniform(key, shape, bound)


def maxout_params(key, in_ch: int, out_ch: int, pool: int, ksize: int, block: int = 0):
    """Maxout2d params (reference: dmpfold/network.py:12-23): conv to
    out_ch*pool channels with Xavier gain 1/sqrt(block), affine InstanceNorm."""
    kw, kb = jax.random.split(key)
    gain = 1.0 / jnp.sqrt(jnp.asarray(max(block, 1), jnp.float32))
    fan_in = in_ch * ksize * ksize
    return {
        "w": _xavier_uniform(kw, (ksize, ksize, in_ch, out_ch * pool), gain),
        "b": _uniform(kb, (out_ch * pool,), 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))),
        "gamma": jnp.ones((out_ch,), jnp.float32),
        "beta": jnp.zeros((out_ch,), jnp.float32),
    }


def _fused_fits(maxout_p, x, pool: int = 4, with_argmax: bool = False) -> bool:
    """Eligibility gate for the fused conv kernel at this shape (channel
    lane alignment — see kernels.conv_block.fused_fits; long rows that
    overflow VMEM are column-tiled by the kernel itself, so row width no
    longer disqualifies).
    ``with_argmax``: the differentiable path also banks the argmax residual."""
    from ..kernels.conv_block import fused_fits

    return fused_fits(x.shape[2], c_out=maxout_p["w"].shape[-1],
                      c_in=maxout_p["w"].shape[-2], pool=pool,
                      with_argmax=with_argmax)


def _gemm_input_enabled() -> bool:
    """Gate for the fused GEMM+maxout input layer (kernels/conv_block.py
    gemm_maxout). Interpret-mode parity is tested; set
    DMPFOLD2_FUSED_INPUT=0 to keep the XLA input conv if the kernel
    misbehaves on a future toolchain (it is a pure perf routing choice —
    both paths are numerically validated against each other). Hardware
    validated round 5 after the device-server outage cleared: bf16-scale
    parity (max|err| 1% of activation scale vs the unfused path) and
    6.5 -> 5.4 ms per pass at B=16 L=88 (the residual cost is the 955->1024
    lane-pad pass and per-tile weight streaming; noted in PERFORMANCE.md)."""
    import os

    return os.environ.get("DMPFOLD2_FUSED_INPUT", "1") != "0"


def _mask_nres(mask):
    """Per-target valid length from a pair mask.

    The fused-norm kernels take a scalar ``nres`` per target instead of the
    full (B, L, L, 1) mask, which is valid ONLY because every mask in this
    framework is the outer product of a right-padded row mask
    (``mask[b,i,j] == (i < nres_b) & (j < nres_b)`` — engine/fold.py and
    gruresnet build them exactly so). An interior-hole or ragged mask would
    silently get wrong statistics here; such masks must use the unfused
    ``masked_instance_norm`` path.
    """
    if mask is None:
        return None
    return mask[:, :, 0, 0].sum(axis=1).astype(jnp.int32)


def maxout2d(params, x, pool: int, dilation: int = 1, mask=None, compute_dtype=None,
             fused_conv: bool = False):
    """Conv to C*pool channels, max over pool groups, instance norm.

    With ``compute_dtype=bfloat16`` the activation chain stays bf16 (norm
    statistics are still fp32) to halve the HBM traffic between convs.
    ``fused_conv`` routes the 5x5 conv+bias+maxout through the Pallas kernel
    (kernels/conv_block.py, ~25% faster on TPU; bf16 + unsharded only).
    """
    ksize = params["w"].shape[0]
    if (fused_conv == "norm" and ksize == 1 and dilation == 1
            and _gemm_input_enabled()
            and compute_dtype == jnp.bfloat16 and _sharding_inactive()):
        # 1x1 maxout (the trunk input layer): fused GEMM+maxout+norm kernel
        # — XLA otherwise round-trips the pool-times-wider intermediate
        # through HBM (measured 6.3-6.8 ms at B=16 L=88, ~13% of the whole
        # batched fold, vs ~2 ms fused)
        from ..kernels.conv_block import gemm_maxout_fits, gemm_maxout_norm

        if gemm_maxout_fits(x.shape, params["w"].shape[-1], pool,
                            with_stats=True):
            return gemm_maxout_norm(x.astype(jnp.bfloat16), params["w"],
                                    params["b"], params["gamma"],
                                    params["beta"], pool, _mask_nres(mask),
                                    mask)
    # the non-"norm" path runs the differentiable kernel, whose VJP
    # additionally banks the argmax residual in the band (_fused_fits)
    use_fused = _use_fused(params, x, pool, dilation, compute_dtype, fused_conv)
    if use_fused and fused_conv == "norm":
        # inference-only fully-fused path: conv+bias+maxout+InstanceNorm in
        # one kernel (stats computed in the epilogue, one HBM round-trip
        # fewer per block); output is already normalized, masked and bf16
        from ..kernels.conv_block import conv5x5_maxout_norm

        return conv5x5_maxout_norm(x.astype(jnp.bfloat16), params["w"],
                                   params["b"], params["gamma"],
                                   params["beta"], pool, _mask_nres(mask), mask)
    out = _conv_max(params, x, pool, dilation, compute_dtype,
                    use_fused=use_fused)
    out = masked_instance_norm(out, params["gamma"], params["beta"], mask)
    if compute_dtype is not None:
        out = out.astype(compute_dtype)
    return out


def _conv_max(params, x, pool: int, dilation: int, compute_dtype, use_fused):
    """The conv+bias+maxout half of :func:`maxout2d` (norm excluded)."""
    if use_fused:
        from ..kernels.conv_block import conv5x5_maxout_diff

        # custom-VJP wrapper: identical kernel when no gradients are
        # requested; differentiable (argmax-routed hand-written backward)
        # so the bf16 training path can take the fused kernel too
        return conv5x5_maxout_diff(x.astype(jnp.bfloat16), params["w"],
                                   params["b"], pool)
    out = conv2d(x, params["w"], params["b"], dilation, compute_dtype)
    b, h, w, c = out.shape
    return out.reshape(b, h, w, c // pool, pool).max(axis=-1)


def _use_fused(params, x, pool: int, dilation: int, compute_dtype, fused_conv):
    ksize = params["w"].shape[0]
    return (
        fused_conv and ksize == KSIZE_FUSED and dilation == 1
        and compute_dtype == jnp.bfloat16 and _sharding_inactive()
        and _fused_fits(params, x, pool, with_argmax=(fused_conv != "norm"))
    )


def scse_params(key, width: int, reduction: int = 16):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    red = width // reduction
    inv_sqrt = lambda n: 1.0 / jnp.sqrt(jnp.asarray(n, jnp.float32))
    return {
        # channel SE: two bias-free linears (reference: network.py:37-53)
        "cse_w1": _uniform(k1, (width, red), inv_sqrt(width)),
        "cse_w2": _uniform(k2, (red, width), inv_sqrt(red)),
        # spatial SE: 1x1 conv to a single channel (reference: network.py:56-67)
        "sse_w": _uniform(k3, (1, 1, width, 1), inv_sqrt(width)),
        "sse_b": _uniform(k4, (1,), inv_sqrt(width)),
    }


def scse(params, x, mask=None, pooled_const=None):
    """Concurrent spatial & channel squeeze-excitation: cSE(x) + sSE(x).

    ``pooled_const``: exact spatial mean of ``x`` when known a priori. In
    this architecture cSE always pools an InstanceNorm(affine) output, whose
    per-channel spatial mean is *identically* the norm's beta (the normalized
    part sums to zero over the statistics region by construction) — verified
    exact against the torch oracle. Passing beta turns the cSE gate into a
    per-model constant: one full map traversal (the masked pooling
    reduction) disappears from every block of every recycle, and the
    gradient is mathematically unchanged (d pooled / d x ≡ 0).
    """
    if pooled_const is not None:
        pooled = pooled_const.astype(jnp.float32)[None, :]     # (1, C)
    else:
        pooled = masked_spatial_mean(x.astype(jnp.float32), mask)  # (B, C)
    y = jax.nn.relu(pooled @ params["cse_w1"]) @ params["cse_w2"]
    cse_out = x * jax.nn.sigmoid(y).astype(x.dtype)[:, None, None, :]

    # keep the 1x1 conv's compute dtype equal to x's so its VJP is
    # dtype-consistent under reverse-mode AD (bf16 training policy)
    sse_dtype = x.dtype if x.dtype == jnp.bfloat16 else None
    s = jax.nn.sigmoid(conv2d(x, params["sse_w"], params["sse_b"],
                              compute_dtype=sse_dtype)).astype(x.dtype)
    sse_out = x * s
    return cse_out + sse_out


def block_params(key, width: int, ksize: int, block_idx: int):
    k1, k2 = jax.random.split(key)
    return {
        "maxout": maxout_params(k1, width, width, pool=4, ksize=ksize, block=block_idx),
        "scse": scse_params(k2, width),
    }


def _resnet_block_fused_norm(params, x, mask):
    """Fully-fused inference block: Pallas conv+maxout with in-kernel norm
    statistics, then ONE fused elementwise pass applying normalization,
    SCSE gating, residual add and mask.

    The normalized activation never materializes in HBM: the InstanceNorm's
    per-target (scale, shift) are absorbed into the sSE 1×1 conv weights
    (y·w = z·(scale·w) + shift·w, so the conv reads the RAW maxout output)
    and re-applied inline inside the gating expression, which XLA fuses
    with the residual and mask into a single read of (z, sse map, x) and
    one write. cSE uses the constant-beta gate (see :func:`scse`).
    """
    mp, sp = params["maxout"], params["scse"]
    from ..kernels.conv_block import conv5x5_maxout_stats

    z, scale, shift = conv5x5_maxout_stats(
        x.astype(jnp.bfloat16), mp["w"], mp["b"], mp["gamma"], mp["beta"],
        4, _mask_nres(mask))
    # constant cSE gate: the pooled mean of the normalized output is beta
    pooled = mp["beta"].astype(jnp.float32)[None, :]
    g = jax.nn.sigmoid(jax.nn.relu(pooled @ sp["cse_w1"]) @ sp["cse_w2"])
    # sSE on the raw output with absorbed scale/shift
    w_sse = sp["sse_w"][0, 0, :, 0]                            # (C,)
    w_eff = (scale * w_sse[None, :]).astype(jnp.bfloat16)      # (B, C)
    s_bias = shift @ w_sse + sp["sse_b"][0]                    # (B,)
    s = jnp.einsum("bhwc,bc->bhw", z, w_eff,
                   preferred_element_type=jnp.float32) + s_bias[:, None, None]
    gate = g[:, None, None, :] + jax.nn.sigmoid(s)[..., None]
    y = (z.astype(jnp.float32) * scale[:, None, None, :]
         + shift[:, None, None, :])
    out = (y * gate + x.astype(jnp.float32)).astype(x.dtype)
    if mask is not None:
        out = out * mask
    return out


def resnet_block(params, x, mask=None, dilation: int = 1, *, dropout_rng=None,
                 dropout_rate: float = 0.2, compute_dtype=None,
                 fused_conv: bool = False, remat_tail: bool = False):
    """Residual block (reference: dmpfold/network.py:85-103).

    ``remat_tail``: checkpoint only the norm+SE tail instead of the caller
    checkpointing the whole block — the conv+maxout output (and the fused
    kernel's int8 argmax) are then *saved* for the backward, which skips the
    expensive conv recompute and replays only the cheap elementwise tail.
    Trades ~3x the per-block residual memory for backward time; the train
    step picks per-shape (train/step.py:_resolve_remat).
    """
    if (fused_conv == "norm" and dropout_rng is None and dilation == 1
            and params["maxout"]["w"].shape[0] == KSIZE_FUSED
            and compute_dtype == jnp.bfloat16 and _sharding_inactive()
            and _fused_fits(params["maxout"], x, pool=4)):
        return _resnet_block_fused_norm(params, x, mask)
    if fused_conv == "norm":
        # the fully-fused path didn't qualify (e.g. training dropout): fall
        # back to the differentiable fused kernel + unfused norm rather than
        # sending "norm" into the inference-only kernel below
        fused_conv = True
    out = x
    if dropout_rng is not None and dropout_rate > 0.0:
        r1, r2 = jax.random.split(dropout_rng)
        keep = 1.0 - dropout_rate
        # elementwise dropout then channelwise (Dropout2d) dropout
        m1 = jax.random.bernoulli(r1, keep, out.shape)
        out = jnp.where(m1, out / keep, 0.0)
        m2 = jax.random.bernoulli(r2, keep, (out.shape[0], 1, 1, out.shape[3]))
        out = jnp.where(m2, out / keep, 0.0)
    mx = params["maxout"]
    use_fused = _use_fused(mx, out, 4, dilation, compute_dtype, fused_conv)
    y = _conv_max(mx, out, 4, dilation, compute_dtype, use_fused)

    def tail(y_, x_):
        t = masked_instance_norm(y_, mx["gamma"], mx["beta"], mask)
        if compute_dtype is not None:
            t = t.astype(compute_dtype)
        # cSE pools the InstanceNorm output -> its spatial mean is exactly
        # the norm's beta; see scse() docstring
        t = scse(params["scse"], t, mask, pooled_const=mx["beta"])
        t = (t + x_).astype(x_.dtype)
        if mask is not None:
            t = t * mask
        return t

    if remat_tail:
        tail = jax.checkpoint(tail)
    return tail(y, x)


def trunk_params(key, in_channels: int = TRUNK_IN_CHANNELS, width: int = DEFAULT_WIDTH,
                 num_blocks: int = NUM_BLOCKS, ksize: int = 5):
    keys = jax.random.split(key, num_blocks + 2)
    blocks = [block_params(keys[i], width, ksize, i + 1) for i in range(num_blocks)]
    # stack the identical blocks along a leading axis for lax.scan
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    inv_sqrt_w = 1.0 / jnp.sqrt(jnp.asarray(width, jnp.float32))
    kow, kob = jax.random.split(keys[num_blocks])
    return {
        "input": maxout_params(keys[num_blocks + 1], in_channels, width, pool=3, ksize=1),
        "blocks": stacked,
        "out_w": _uniform(kow, (1, 1, width, 2), inv_sqrt_w),
        "out_b": _uniform(kob, (2,), inv_sqrt_w),
    }


def trunk_apply(params, x, mask=None, *, dropout_rng=None, remat: bool = False,
                compute_dtype=None, fused_conv: bool = False):
    """(B, L, L, 955) -> (B, L, L, 2): distance-map + confidence channels.

    ``compute_dtype=jnp.bfloat16`` runs the convs (~85% of pipeline FLOPs,
    SURVEY §3.3) on the MXU in bf16 with fp32 accumulation; norms, SE and
    residual adds stay fp32.
    """
    out = maxout2d(params["input"], shard_pair(x), pool=3, mask=mask,
                   compute_dtype=compute_dtype, fused_conv=fused_conv)
    if mask is not None:
        out = out * mask
    out = shard_pair(out)
    if compute_dtype is not None:
        out = out.astype(compute_dtype)

    num_blocks = jax.tree.leaves(params["blocks"])[0].shape[0]
    if dropout_rng is not None:
        rngs = jax.random.split(dropout_rng, num_blocks)
    else:
        rngs = None

    # remat: True checkpoints the whole block body (minimum memory: one
    # carry per block); "save_conv" banks the conv+maxout output and argmax
    # instead and replays only the norm+SE tail in the backward (~25%
    # faster trunk grad for ~3x the residual bytes, train/step.py picks)
    remat_tail = remat == "save_conv"

    def body(carry, block):
        if rngs is None:
            p = block
            new = resnet_block(p, carry, mask, compute_dtype=compute_dtype,
                               fused_conv=fused_conv, remat_tail=remat_tail)
        else:
            p, rng = block
            new = resnet_block(p, carry, mask, dropout_rng=rng,
                               compute_dtype=compute_dtype,
                               fused_conv=fused_conv, remat_tail=remat_tail)
        return shard_pair(new), None

    if remat is True:
        body = jax.checkpoint(body)

    xs = params["blocks"] if rngs is None else (params["blocks"], rngs)
    out, _ = jax.lax.scan(body, out, xs)

    out = conv2d(out.astype(jnp.float32), params["out_w"], params["out_b"])
    if mask is not None:
        out = out * mask
    return out
