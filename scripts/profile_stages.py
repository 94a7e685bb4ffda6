"""Stage decomposition of the batched fold on the real chip.

The per-batch wall-clock is decomposed WITHOUT a profiler by exploiting that
``iterations``/``minsteps`` are traced trip counts — the same compiled
program runs with different counts, so differences isolate stages:

  t(0, 0)             = features/DCA + GRUs + 1 trunk pass + MDS + backbone + IO
  t(n, 0) - t(0, 0)   = n x (trunk pass + MDS eigh + coord GRU)   [recycle cost]
  t(n, m) - t(n, 0)   = 2 x m refine steps                         [refine cost]

plus amortized in-graph component timings (lax.scan of the op with a tiny
perturbation so XLA can't hoist it; one device fetch per measurement — the
remote tunnel adds ~28 ms per dispatch, which scan repetition amortizes).

Usage: python scripts/profile_stages.py [batch] [n_targets]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from dmpfold2_tpu.utils import assets

EXAMPLE_ALN = assets.example_aln_path()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def amortized_ms(fn, x, repeats: int = 20) -> float:
    """Time fn amortized over `repeats` in-graph applications."""
    import jax
    import jax.numpy as jnp

    def body(carry, c):
        v, acc = carry
        # the 1e-30 perturbation defeats CSE/loop hoisting (each iteration's
        # input differs) without changing the math measurably
        out = fn(v + c * jnp.asarray(1e-30, v.dtype))
        acc = acc + jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32))
        return (v, acc), None

    @jax.jit
    def run(v):
        (_, acc), _ = jax.lax.scan(
            body, (v, jnp.float32(0.0)), jnp.arange(repeats, dtype=v.dtype))
        return acc

    float(run(x))  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x))
        times.append(time.perf_counter() - t0)
    return min(times) / repeats * 1000


def main():
    import jax
    import jax.numpy as jnp

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".cache", "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    from bench import get_bench_params
    from dmpfold2_tpu.parallel.stream import BatchFolder, Target
    from dmpfold2_tpu.utils.aln import parse_aln

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_targets = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    params = get_bench_params()
    rng = np.random.default_rng(0)
    base = parse_aln(EXAMPLE_ALN)
    targets = [Target(alnmat=base[: int(rng.integers(200, 252))])
               for _ in range(n_targets)]

    folder = BatchFolder(params, batch_size=batch, precision="bf16")

    def tps(it, ms):
        folder.fold_many(targets[:batch], iterations=it, minsteps=ms)  # warm
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            folder.fold_many(targets, iterations=it, minsteps=ms)
            times.append(time.perf_counter() - t0)
        return min(times)

    t_full = tps(10, 100)
    t_norefine = tps(10, 0)
    t_norecycle = tps(0, 0)
    t_refonly = tps(0, 100)

    per_recycle = (t_norefine - t_norecycle) / 10
    refine_cost = t_full - t_norefine
    log(f"\n=== batched fold decomposition (B={batch}, {n_targets} targets, bf16) ===")
    log(f"full (n=10, m=100):       {t_full:.3f}s  ({n_targets / t_full:.1f} targets/s)")
    log(f"no refine (n=10, m=0):    {t_norefine:.3f}s")
    log(f"base (n=0, m=0):          {t_norecycle:.3f}s  "
        f"[features+DCA+GRUs+1 trunk pass+MDS+backbone+host IO]")
    log(f"refine only (n=0, m=100): {t_refonly:.3f}s")
    log(f"per recycle (trunk+eigh+coord_gru): {per_recycle * 1000:.1f}ms")
    log(f"2x100 refine steps: {refine_cost * 1000:.1f}ms "
        f"(cross-check n=0: {(t_refonly - t_norecycle) * 1000:.1f}ms)")

    # --- component timings at the bucket shape, amortized in-graph
    from dmpfold2_tpu.engine.buckets import bucket_shape
    from dmpfold2_tpu.models.trunk import trunk_apply
    from dmpfold2_tpu.models import geometry

    n_pad, l_pad = bucket_shape(252, 82)
    log(f"\n=== components at bucket ({n_pad}, {l_pad}), batch {batch} ===")

    nres_b = jnp.full((batch,), 82, jnp.int32)
    row_mask_b = (jnp.arange(l_pad)[None, :] < nres_b[:, None])
    pair_mask_b = (row_mask_b[:, :, None] & row_mask_b[:, None, :])[..., None]

    x = jnp.asarray(rng.normal(size=(batch, l_pad, l_pad, 955)), jnp.bfloat16)
    fused = "norm" if jax.default_backend() == "tpu" else False
    ms_trunk = amortized_ms(
        lambda v: trunk_apply(params["trunk"], v, pair_mask_b,
                              compute_dtype=jnp.bfloat16, fused_conv=fused),
        x, repeats=5)
    log(f"trunk pass bf16 (fused_conv={fused!r}): {ms_trunk:.2f} ms")

    gram = rng.normal(size=(batch, l_pad, l_pad)).astype(np.float32)
    gram = jnp.asarray(gram + np.swapaxes(gram, 1, 2))
    mds_impl = "subspace" if jax.default_backend() == "tpu" else "eigh"
    ms_mds = amortized_ms(
        lambda v: jax.vmap(lambda d, nr: geometry.mds_coords(
            d, nr, impl=mds_impl))(v, nres_b),
        gram, repeats=10)
    log(f"MDS ({mds_impl}+coords) B={batch}: {ms_mds:.2f} ms")

    ca = jnp.asarray(rng.normal(size=(batch, l_pad, 3)) * 3, jnp.float32)
    ms = amortized_ms(
        lambda v: jax.vmap(lambda c, nr: geometry.refine_coords(c, 100, nr))(v, nres_b),
        ca, repeats=5)
    log(f"refine 100 steps (xla) B={batch}: {ms:.2f} ms")

    # --- base-pass components: DCA features and the vertical GRU
    from dmpfold2_tpu.features.dca import dca_or_zero
    from dmpfold2_tpu.features.msa import msa_one_hot, reweight

    aln = jnp.asarray(rng.integers(0, 21, (batch, n_pad, l_pad)), jnp.int32)
    nseqs_b = jnp.full((batch,), 252, jnp.int32)
    oh = jax.jit(jax.vmap(msa_one_hot))(aln, nseqs_b, nres_b)

    def dca_from_oh(ohv):
        def one(o, ns, nr):
            w = reweight(o, nr)
            return dca_or_zero(o, w, ns, nr, method="cholesky")
        return jax.vmap(one)(ohv, nseqs_b, nres_b)

    ms = amortized_ms(dca_from_oh, oh, repeats=5)
    log(f"reweight+DCA (cholesky) B={batch}: {ms:.2f} ms")

    def dca_schur(ohv):
        def one(o, ns, nr):
            w = reweight(o, nr)
            return dca_or_zero(o, w, ns, nr, method="schur")
        return jax.vmap(one)(ohv, nseqs_b, nres_b)

    ms = amortized_ms(dca_schur, oh, repeats=5)
    log(f"reweight+DCA (schur)    B={batch}: {ms:.2f} ms")

    if jax.default_backend() == "tpu":
        from dmpfold2_tpu.kernels.vgru import vgru_final_cols_pallas

        layers = params["vgru"]
        aln_cols = jnp.transpose(aln, (1, 0, 2)).reshape(n_pad, batch * l_pad)
        col_valid = jnp.repeat(nseqs_b, l_pad)
        def vgru_w(v):
            l0 = dict(layers[0]); l0["wi"] = v
            return vgru_final_cols_pallas([l0] + list(layers[1:]), aln_cols, col_valid)
        ms_vgru = amortized_ms(vgru_w, layers[0]["wi"], repeats=5)
        log(f"vgru (pallas, batched) B={batch}: {ms_vgru:.2f} ms")

    # --- remaining base-pass components (round-4 verdict item 2: the
    # budget's rows must sum to the measured fold, so every stage needs a
    # line — these were the unmeasured ones). Exact production call shapes
    # (gruresnet.forward_batched:287-313).
    from dmpfold2_tpu.models import gruresnet

    rgru = "pallas" if jax.default_backend() == "tpu" else "scan"

    # hgru (bidirectional residue GRU over the vgru summary) + pair outer
    seq_embed = jnp.asarray(rng.normal(size=(batch, l_pad, 512)), jnp.float32)

    def hgru_outer(v):
        hin = jnp.transpose(v, (1, 0, 2))                     # (L, B, 512)
        mat1d = gruresnet._bigru(params["hgru"], hin, nres_b, None, rgru)
        mat1d = (jnp.transpose(mat1d, (1, 0, 2))
                 * row_mask_b[..., None].astype(jnp.float32))
        return mat1d[:, :, None, :] * mat1d[:, None, :, :]    # (B, L, L, 512)

    ms_hgru = amortized_ms(hgru_outer, seq_embed, repeats=5)
    log(f"hgru+pair outer B={batch}: {ms_hgru:.2f} ms")

    # coord head: 3-layer biGRU over the (mat1d | mds) embed + linear
    cemb = jnp.asarray(rng.normal(size=(batch, l_pad, 520)), jnp.float32)

    def coord_head(v):
        g = gruresnet._bigru(params["coord_gru"], jnp.transpose(v, (1, 0, 2)),
                             nres_b, None, rgru)
        return jnp.transpose(g, (1, 0, 2)) @ params["coord_fc"]

    ms_head = amortized_ms(coord_head, cemb, repeats=5)
    log(f"coord head (3x biGRU+fc, {rgru}) B={batch}: {ms_head:.2f} ms")

    # backbone completion (runs once per fold)
    ca = jnp.asarray(rng.normal(size=(batch, l_pad, 3)) * 3, jnp.float32)
    ms_bb = amortized_ms(
        lambda v: jax.vmap(gruresnet.calpha_to_main_chain)(v, nres_b),
        ca, repeats=10)
    log(f"backbone completion B={batch}: {ms_bb:.2f} ms")

    # --- budget summary: device component rows vs the measured per-batch
    # wall-clock splits (gap = dispatch/host/concat work not covered by a
    # component row — the round-4 93%-kernel-vs-71%-pipeline question)
    n_batches = -(-n_targets // batch)
    base_ms = t_norecycle / n_batches * 1000
    rec_ms = per_recycle / n_batches * 1000       # one recycle, one batch
    ref_ms = refine_cost / n_batches * 1000
    full_ms = t_full / n_batches * 1000
    per_pass = ms_trunk + ms_mds + ms_head        # shared by base + recycle
    log(f"\n=== budget (ms per batch of {batch}, bucket ({n_pad}, {l_pad})) ===")
    log(f"  component rows: trunk {ms_trunk:.1f} + MDS {ms_mds:.1f} + "
        f"head {ms_head:.1f} = per-pass {per_pass:.1f}")
    log(f"  measured per recycle:    {rec_ms:8.1f}   "
        f"(gap vs components: {rec_ms - per_pass:+.1f} = dmap rebuild + "
        "best-by-conf select)")
    base_components = per_pass + ms_hgru + ms_bb  # + vgru + DCA (printed above)
    log(f"  measured base t(0,0):    {base_ms:8.1f}   "
        f"(components excl. vgru/DCA/dispatch: {base_components:.1f})")
    log(f"  measured refine 2x100:   {ref_ms:8.1f}")
    log(f"  measured full t(10,100): {full_ms:8.1f}   "
        f"(= base + 10x recycle + refine: "
        f"{base_ms + 10 * rec_ms + ref_ms:.1f})")


if __name__ == "__main__":
    main()
