"""Mask-aware normalization ops.

Instance norm over padded L×L maps is the classic silent-wrongness trap: the
statistics must be computed over the valid region only, otherwise padding
shifts every channel's mean/variance. With a full-coverage mask these reduce
exactly to the unpadded torch semantics (biased variance, eps=1e-5).
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_instance_norm(x, gamma, beta, mask=None, eps: float = 1e-5):
    """InstanceNorm2d(affine) on NHWC ``x`` with optional (B, H, W, 1) mask.

    Matches torch.nn.InstanceNorm2d (reference: dmpfold/network.py:19): per
    (batch, channel) statistics over the spatial dims, biased variance.
    Output is re-masked so padding stays exactly zero.
    """
    in_dtype = x.dtype
    x = x.astype(jnp.float32)  # statistics always in fp32 (bf16-safe)
    if mask is None:
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
        return ((x - mean) / jnp.sqrt(var + eps) * gamma + beta).astype(in_dtype)
    count = jnp.maximum(jnp.sum(mask, axis=(1, 2), keepdims=True), 1.0)
    mean = jnp.sum(x * mask, axis=(1, 2), keepdims=True) / count
    var = jnp.sum(jnp.square(x - mean) * mask, axis=(1, 2), keepdims=True) / count
    out = (x - mean) / jnp.sqrt(var + eps) * gamma + beta
    return (out * mask).astype(in_dtype)


def masked_spatial_mean(x, mask=None):
    """Mean over H, W of NHWC ``x`` -> (B, C), honoring the validity mask."""
    if mask is None:
        return jnp.mean(x, axis=(1, 2))
    count = jnp.maximum(jnp.sum(mask, axis=(1, 2)), 1.0)
    return jnp.sum(x * mask, axis=(1, 2)) / count
