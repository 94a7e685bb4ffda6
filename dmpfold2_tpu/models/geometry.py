"""Geometry ops: MDS coordinate seeding, CA-trace refinement, backbone completion.

Mask-aware, shape-static reformulations of the reference geometry
(reference: dmpfold/network.py:106-177, 241-250). Everything runs device-side
under jit; trip counts may be traced scalars (`lax.fori_loop`) for inference
or static ints (`lax.scan`) when reverse-mode gradients are needed.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp

VDW_DIST = 3.0
COV_DIST = 3.78
K_VDW = 100.0
K_COV = 100.0
STEP_SIZE = 0.001

# below this pair-map size subspace iteration cannot return 8 full
# eigenpairs from a q=32 basis without shrinking it, so mds_coords keeps the
# exact eigh (whose cost is trivial there). Round 3 gated at 192 believing
# cost parity below that — a single-dispatch RPC-floor measurement artifact;
# the chained round-4 probe shows subspace 3-4x faster at L=88-128 even
# single-target (0.22 vs 0.07 ms) and 2.3x batched (16x88: 4.9 vs 2.1 ms
# per recycle), so the throughput engine now runs it at every bucket size.
# Tests monkeypatch this to force either path at toy sizes.
SUBSPACE_MIN_L = 32


def _normalize(v, eps: float = 1e-12):
    # F.normalize semantics: v / max(||v||, eps). Clamping INSIDE the sqrt
    # (forward-identical: sqrt(max(s, eps²)) == max(sqrt(s), eps)) keeps the
    # backward pass finite at v == 0, where sqrt's gradient is infinite —
    # padded residues can have exactly-coincident CAs, whose zero cross
    # products otherwise turn the whole sample's gradient NaN (0·inf).
    n = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(v), axis=-1, keepdims=True),
                             eps * eps))
    return v / n


def mds_coords(dm, nres=None, n_dims: int = 8, canonical_signs: bool = True,
               impl: str = "eigh"):
    """Distance-map channel -> top-``n_dims`` MDS embedding (L, n_dims).

    Mirrors reference network.py:241-250: symmetrize, abs, Gram matrix from
    the first row/column, eigendecomposition, coordinates from the largest
    eigenpairs. Padded rows/cols are zeroed before ``eigh`` so the valid
    block's spectrum is preserved exactly (padding adds exact-zero
    eigenvalues whose eigenvectors vanish on the valid region).

    ``canonical_signs`` fixes the per-column sign ambiguity of ``eigh``
    deterministically (largest-|component| positive) for reproducibility.
    The reference inherits raw LAPACK ``syev`` signs (network.py:247), so
    bit-fidelity checks against a reference run must pass False here to
    compare like-for-like (the engine's ``fp32_strict`` mode does).
    Robustness of the released weights to sign flips is measured in
    tests/test_eigh_signs.py and documented in ARCHITECTURE.md.

    ``impl="subspace"`` computes only the top-``n_dims`` eigenpairs via
    MXU-resident subspace iteration (ops/eigh.py) instead of a full
    ``eigh`` — the throughput-mode choice on TPU for large buckets, where
    XLA's full ``eigh`` is sequential and off-MXU (5.7x faster at L=768).
    Carries the same eps*λ_max fp32 error floor as LAPACK's syev; measured
    ~0.5% of the coordinate scale on realistic Grams
    (tests/test_subspace_eigh.py); inference-only (no VJP).
    """
    l_pad = dm.shape[-1]
    if impl == "subspace" and l_pad < SUBSPACE_MIN_L:
        # keep the exact path for small buckets — the throughput buckets'
        # numerics stay identical to the fp32 engine's
        impl = "eigh"
    dm = 0.5 * (dm + dm.T)
    dm = jnp.abs(dm)
    gram = 0.5 * (jnp.square(dm[0:1, :]) + jnp.square(dm[:, 0:1]) - jnp.square(dm))
    if nres is not None:
        col = jnp.arange(l_pad) < nres
        gram = gram * (col[:, None] & col[None, :])
    if impl == "subspace":
        from ..ops.eigh import subspace_topk

        # padding handling differs from the eigh path below: the zeroed
        # rows/cols are already invisible to the iteration (one multiply by
        # the block matrix zeroes the start basis' padding components, and
        # exact-zero eigenvalues never reach the algebraic top-8 ahead of
        # positive ones), so no diagonal shift is needed. Caveat: that
        # assumes the valid Gram block has >= 8 positive eigenvalues; a
        # rank-deficient block (nres < ~10) can let padding's exact-zero
        # eigenpairs occupy trailing top-8 slots, unlike the eigh path whose
        # pad_diag sinks padding below even negative valid eigenvalues. The
        # affected columns are clamped to sqrt(1e-8) so the coordinate
        # impact is ~1e-4-scale and inference-only (pinned by
        # tests/test_subspace_eigh.py::test_subspace_tiny_nres).
        w8, v8 = subspace_topk(gram, k=n_dims)
        w8 = jnp.maximum(w8, 1e-8)
        if canonical_signs:
            comp = jnp.take_along_axis(
                v8, jnp.argmax(jnp.abs(v8), axis=0)[None, :], axis=0)[0]
            v8 = v8 * jnp.where(comp < 0, -1.0, 1.0)
        return v8 * jnp.sqrt(w8)
    if nres is not None:
        col = jnp.arange(l_pad) < nres
        # distinct, very negative diagonal entries on the padded coordinates:
        # the matrix stays block-diagonal (valid spectrum preserved exactly)
        # while padding eigenpairs sink to the bottom of the sorted spectrum,
        # so (a) the top-8 selection matches the unpadded computation and
        # (b) no exact-zero DEGENERATE eigenvalues remain — the eigh VJP
        # divides by eigenvalue gaps, so degenerate padding zeros made every
        # padded training sample's gradient NaN (then skipped by the
        # non-finite guard: silent no-progress on padded buckets).
        pad_diag = jnp.where(col, 0.0, -(1e6 + jnp.arange(l_pad, dtype=dm.dtype)))
        gram = gram + jnp.diag(pad_diag)
    w, v = jnp.linalg.eigh(gram)
    w8 = jnp.maximum(w[-n_dims:], 1e-8)  # == clamp(relu(w), min=1e-8)
    v8 = v[:, -n_dims:]
    if canonical_signs:
        # canonicalize the implementation-arbitrary eigh signs
        # deterministically: largest-|component| of each vector > 0.
        comp = jnp.take_along_axis(
            v8, jnp.argmax(jnp.abs(v8), axis=0)[None, :], axis=0)[0]
        sign = jnp.where(comp < 0, -1.0, 1.0)
        v8 = v8 * sign
    return v8 * jnp.sqrt(w8)


def _refine_step(coords, valid, adj_valid):
    """One Euler step of the reference force field (network.py:111-135)."""
    # steric repulsion below VDW_DIST, all pairs
    diffs = coords[None, :, :] - coords[:, None, :]  # diffs[i, j] = c[j] - c[i]
    sq = jnp.sum(jnp.square(diffs), axis=2)
    dists = jnp.clip(jnp.sqrt(jnp.maximum(sq, 1e-12)), 0.01, 10.0)
    norm_diffs = diffs / dists[:, :, None]
    violate = jnp.where(dists < VDW_DIST, VDW_DIST - dists, 0.0)
    violate = violate * (valid[:, None] & valid[None, :])
    accels = jnp.sum(K_VDW * violate[:, :, None] * norm_diffs, axis=0)

    # adjacent-CA spring toward COV_DIST
    adiffs = coords[1:] - coords[:-1]
    adists = jnp.maximum(jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(adiffs), axis=1), 1e-12)), 0.1)
    anorm = adiffs / adists[:, None]
    aviolate = jnp.minimum(adists - COV_DIST, 3.0) * adj_valid
    acc_cov = K_COV * aviolate[:, None] * anorm
    accels = accels.at[:-1].add(acc_cov)
    accels = accels.at[1:].add(-acc_cov)

    return coords + jnp.clip(accels, -100.0, 100.0) * STEP_SIZE


def refine_coords(coords, n_steps, nres=None, impl: str = "xla"):
    """Iterative CA-trace refinement; ``n_steps`` may be a traced scalar.

    ``coords``: (L, 3). Padded positions receive zero force and exert none.
    ``impl="pallas"`` runs the whole loop in one fused kernel with the state
    VMEM-resident (kernels/refine.py) — inference only (no VJP; static-step
    training always takes the differentiable scan below).
    """
    if impl == "pallas" and not isinstance(n_steps, int):
        from ..kernels.refine import refine_coords_pallas

        return refine_coords_pallas(coords, n_steps, nres)
    l_pad = coords.shape[0]
    idx = jnp.arange(l_pad)
    valid = idx < nres if nres is not None else jnp.ones((l_pad,), bool)
    adj_valid = (idx[:-1] + 1 < nres) if nres is not None else jnp.ones((l_pad - 1,), bool)

    if isinstance(n_steps, int):
        # static trip count: reverse-differentiable scan; checkpoint each
        # step so 100-step refinement doesn't hold 100 O(L^2) residuals
        @jax.checkpoint
        def body(c, _):
            return _refine_step(c, valid, adj_valid), None
        out, _ = jax.lax.scan(body, coords, None, length=n_steps)
        return out
    return jax.lax.fori_loop(
        0, n_steps, lambda _, c: _refine_step(c, valid, adj_valid), coords
    )


def calpha_to_main_chain(ca, nres=None):
    """Levitt-method backbone completion: (L, 3) CA trace -> (L, 5, 3) N/CA/C/O/CB.

    Per-position restatement of reference network.py:141-177. The original
    concatenates dummy terminal CAs and shifts slices; here the terminal
    dummies are dynamic gathers at the true chain end so padded tails don't
    participate. With ``nres == L`` the outputs match the reference formulas
    exactly.
    """
    l_pad = ca.shape[0]
    last = (jnp.asarray(nres) - 1) if nres is not None else jnp.asarray(l_pad - 1)
    idx = jnp.arange(l_pad)

    take = lambda i: jnp.take(ca, i, axis=0, mode="clip")
    ca_last, ca_last1, ca_last2 = take(last), take(last - 1), take(last - 2)

    # dummy terminal CAs at 3.82 Å along the local cross product
    nterm = ca[0] + 3.82 * _normalize(jnp.cross(ca[0] - ca[1], ca[2] - ca[1]))
    cterm = ca_last + 3.82 * _normalize(
        jnp.cross(ca_last - ca_last1, ca_last2 - ca_last1)
    )

    prev = jnp.concatenate([nterm[None], ca[:-1]], axis=0)  # prev[i] = ca[i-1]
    nxt = jnp.concatenate([ca[1:], ca[-1:]], axis=0)        # nxt[i] = ca[i+1]
    nxt = jnp.where((idx == last)[:, None], cterm[None], nxt)

    vec_can = prev - ca
    vec_cac = nxt - ca
    crossv = _normalize(jnp.cross(vec_can, vec_cac))
    mid = 0.5 * (ca + prev)

    coords_n = mid - vec_can / 8.0 + crossv / 4.0

    c_shift = mid + vec_can / 8.0 - crossv / 2.0
    o_shift = mid - 1.8 * crossv
    c_next = jnp.concatenate([c_shift[1:], c_shift[-1:]], axis=0)
    o_next = jnp.concatenate([o_shift[1:], o_shift[-1:]], axis=0)

    cross_last = jnp.take(crossv, last, axis=0, mode="clip")
    mid_end = 0.5 * (cterm + ca_last)
    c_cterm = mid_end - (cterm - ca_last) / 8.0 + cross_last / 2.0
    o_cterm = mid_end + 2.0 * cross_last

    at_last = (idx == last)[:, None]
    coords_c = jnp.where(at_last, c_cterm[None], c_next)
    coords_o = jnp.where(at_last, o_cterm[None], o_next)

    # CB via tetrahedral construction from N, C, CA
    vec_n_ca = ca - coords_n
    vec_c_ca = ca - coords_c
    cross_nc = jnp.cross(vec_n_ca, vec_c_ca)
    vec_ca_cb = vec_n_ca + vec_c_ca
    ang = jnp.pi / 2.0 - jnp.arcsin(1.0 / jnp.sqrt(3.0))
    norm = lambda v: jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(v), axis=-1, keepdims=True), 1e-24))
    sx = 1.5 * jnp.cos(ang) / norm(vec_ca_cb)
    sy = 1.5 * jnp.sin(ang) / norm(cross_nc)
    coords_cb = ca + sx * vec_ca_cb + sy * cross_nc

    return jnp.stack([coords_n, ca, coords_c, coords_o, coords_cb], axis=1)
