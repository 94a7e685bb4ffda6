"""Pallas kernel: the full CA-trace refinement loop in one device program.

The reference runs ``minsteps`` Euler steps of an O(L²) force field
(reference: dmpfold/network.py:106-137), each materializing (L, L, 3)
pairwise tensors. The XLA `fori_loop` path (models/geometry.py) round-trips
those tensors through HBM every step; this kernel keeps the (L, 3) state
VMEM-resident for the *entire* loop and streams the pairwise computation
through row tiles, so arbitrary step counts (`-m 100000`, README "extreme"
mode) cost pure VPU time.

Layout: coordinates live as an (8, L) row-major array (x/y/z in sublanes
0-2, L on lanes). Each step makes one exact (8, L)→(L, 8) transpose so the
pairwise broadcast `c[j] - c[i]` uses identical bit values on both axes
(guaranteeing diffs[i, i] == 0 — any drift there would explode through the
0.01 distance clamp). Numerics mirror models/geometry.py:_refine_step
exactly; parity is tested in tests/test_pallas_refine.py (interpret mode on
CPU, compiled on TPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VDW_DIST = 3.0
COV_DIST = 3.78
K_VDW = 100.0
K_COV = 100.0
STEP_SIZE = 0.001

ROW_TILE = 128  # pairwise row-tile: temporaries are (ROW_TILE, l_pad)


def _refine_kernel(scalars_ref, x_ref, out_ref, ct_ref):
    n_steps = scalars_ref[0]
    nres = scalars_ref[1]
    l_pad = x_ref.shape[1]
    n_tiles = l_pad // ROW_TILE

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, l_pad), 1)
    valid_row = (lane < nres).astype(jnp.float32)              # (1, L)
    adj_row = (lane + 1 < nres).astype(jnp.float32)            # spring i..i+1
    tile_sub = jax.lax.broadcasted_iota(jnp.int32, (ROW_TILE, 1), 0)

    def step(_, coords):
        # coords: (8, L) value; rows 0-2 = x, y, z. The transpose goes
        # through VMEM scratch because Mosaic can only dynamic-slice REFS,
        # not values (pl.ds on ct_ref below).
        ct_ref[:, :] = jnp.transpose(coords)                   # (L, 8), exact
        xr, yr, zr = coords[0:1, :], coords[1:2, :], coords[2:3, :]

        def tile_body(t, accs):
            ax, ay, az = accs
            tile = ct_ref[pl.ds(t * ROW_TILE, ROW_TILE), :]
            xc = tile[:, 0:1]                                  # (T, 1)
            yc = tile[:, 1:2]
            zc = tile[:, 2:3]
            vc = (t * ROW_TILE + tile_sub < nres).astype(jnp.float32)
            dx = xr - xc                                       # (T, L): c[j]-c[i]
            dy = yr - yc
            dz = zr - zc
            sq = dx * dx + dy * dy + dz * dz
            dist = jnp.clip(jnp.sqrt(jnp.maximum(sq, 1e-12)), 0.01, 10.0)
            viol = jnp.where(dist < VDW_DIST, VDW_DIST - dist, 0.0)
            coeff = (K_VDW * viol * (valid_row * vc)) / dist
            # accel[j] = sum_i coeff[i,j] * (c[j]-c[i]) — axis-0 reduce keeps
            # the row layout with no transpose
            ax = ax + jnp.sum(coeff * dx, axis=0, keepdims=True)
            ay = ay + jnp.sum(coeff * dy, axis=0, keepdims=True)
            az = az + jnp.sum(coeff * dz, axis=0, keepdims=True)
            return ax, ay, az

        zero = jnp.zeros((1, l_pad), jnp.float32)
        ax, ay, az = jax.lax.fori_loop(0, n_tiles, tile_body, (zero, zero, zero))

        # adjacent-CA springs: f[i] acts + on i, - on i+1 (network.py:125-135).
        # pltpu.roll requires non-negative shifts: roll by L-1 == roll by -1.
        adx = pltpu.roll(xr, shift=l_pad - 1, axis=1) - xr     # x[i+1]-x[i]
        ady = pltpu.roll(yr, shift=l_pad - 1, axis=1) - yr
        adz = pltpu.roll(zr, shift=l_pad - 1, axis=1) - zr
        asq = adx * adx + ady * ady + adz * adz
        adist = jnp.maximum(jnp.sqrt(jnp.maximum(asq, 1e-12)), 0.1)
        aviol = jnp.minimum(adist - COV_DIST, 3.0) * adj_row
        c = (K_COV * aviol) / adist
        fx, fy, fz = c * adx, c * ady, c * adz                 # masked: adj_row
        # roll(+1) brings f[i-1] to lane i; lane 0 receives f[L-1] == 0 (mask)
        ax = ax + fx - pltpu.roll(fx, shift=1, axis=1)
        ay = ay + fy - pltpu.roll(fy, shift=1, axis=1)
        az = az + fz - pltpu.roll(fz, shift=1, axis=1)

        nx = xr + jnp.clip(ax, -100.0, 100.0) * STEP_SIZE
        ny = yr + jnp.clip(ay, -100.0, 100.0) * STEP_SIZE
        nz = zr + jnp.clip(az, -100.0, 100.0) * STEP_SIZE
        return jnp.concatenate([nx, ny, nz, coords[3:, :]], axis=0)

    out_ref[:, :] = jax.lax.fori_loop(0, n_steps, step, x_ref[:, :])


@partial(jax.jit, static_argnames=("interpret",))
def refine_coords_pallas(coords, n_steps, nres=None, *, interpret: bool = False):
    """Drop-in for geometry.refine_coords (traced ``n_steps``): (L, 3) → (L, 3)."""
    l = coords.shape[0]
    l_pad = max(-(-l // ROW_TILE) * ROW_TILE, ROW_TILE)
    if nres is None:
        nres = l
    x = jnp.zeros((8, l_pad), jnp.float32)
    x = x.at[0:3, :l].set(jnp.transpose(coords).astype(jnp.float32))
    scalars = jnp.asarray(
        [jnp.asarray(n_steps, jnp.int32), jnp.asarray(nres, jnp.int32)])
    out = pl.pallas_call(
        _refine_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((l_pad, 8), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((8, l_pad), jnp.float32),
        interpret=interpret,
    )(scalars, x)
    return jnp.transpose(out[0:3, :l]).astype(coords.dtype)
