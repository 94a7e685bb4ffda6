"""Stage decomposition of the long-target stress fold (BASELINE config 4).

Same trip-count-differencing trick as profile_stages.py, at L=720 (bucket
768) with a 3000-row MSA, plus amortized component timings at the long
bucket: trunk pass, MDS eigh, refine, DCA, vgru.

Usage: python scripts/profile_long.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".cache", "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    from bench import get_bench_params
    from dmpfold2_tpu.engine.fold import Folder
    from scripts.profile_stages import amortized_ms

    params = get_bench_params()
    rng = np.random.default_rng(0)
    nres, nseqs = 720, 3000
    alnmat = rng.integers(0, 21, (nseqs, nres)).astype(np.uint8)
    folder = Folder(params, precision="bf16")

    def t(it, ms):
        folder.fold(alnmat, iterations=it, minsteps=ms)  # warm
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            folder.fold(alnmat, iterations=it, minsteps=ms)
            times.append(time.perf_counter() - t0)
        return min(times)

    t_full = t(30, 100)
    t_norefine = t(30, 0)
    t_base = t(0, 0)
    per_recycle = (t_norefine - t_base) / 30
    log(f"\n=== long-target decomposition (L={nres}->768, {nseqs} rows, bf16) ===")
    log(f"full (n=30, m=100): {t_full:.2f}s")
    log(f"no refine (n=30):   {t_norefine:.2f}s")
    log(f"base (n=0, m=0):    {t_base:.2f}s")
    log(f"per recycle:        {per_recycle*1000:.1f}ms")
    log(f"2x100 refine:       {(t_full - t_norefine)*1000:.1f}ms")

    # --- components at the long bucket
    from dmpfold2_tpu.models.trunk import trunk_apply
    from dmpfold2_tpu.models import geometry

    l_pad = 768
    x = jnp.asarray(rng.normal(size=(1, l_pad, l_pad, 955)), jnp.bfloat16)
    ms = amortized_ms(
        lambda v: trunk_apply(params["trunk"], v, compute_dtype=jnp.bfloat16,
                              fused_conv=True), x, repeats=3)
    log(f"trunk pass bf16+fused @768: {ms:.1f} ms")

    gram = rng.normal(size=(l_pad, l_pad)).astype(np.float32)
    gram = jnp.asarray(gram + gram.T)
    ms = amortized_ms(lambda v: geometry.mds_coords(v, 720), gram, repeats=5)
    log(f"MDS (eigh+coords) @768: {ms:.1f} ms")

    ca = jnp.asarray(rng.normal(size=(l_pad, 3)) * 6, jnp.float32)
    ms = amortized_ms(
        lambda v: geometry.refine_coords(v, 100, 720, impl="pallas"),
        ca, repeats=3)
    log(f"refine 100 steps (pallas) @768: {ms:.1f} ms")

    from dmpfold2_tpu.features.dca import dca_or_zero
    from dmpfold2_tpu.features.msa import msa_one_hot, reweight

    aln = jnp.asarray(alnmat, jnp.int32)
    aln_p = jnp.zeros((3000, l_pad), jnp.int32).at[:, :nres].set(aln)
    oh = jax.jit(msa_one_hot)(aln_p, nseqs, nres)

    def dca_fn(ohv):
        w = reweight(ohv, nres)
        return dca_or_zero(ohv, w, nseqs, nres, method="schur")
    ms = amortized_ms(dca_fn, oh, repeats=2)
    log(f"reweight+DCA (schur) @768: {ms:.1f} ms")

    if jax.default_backend() == "tpu":
        from dmpfold2_tpu.kernels.vgru import vgru_final_cols_pallas

        layers = params["vgru"]
        col_valid = jnp.full((l_pad,), nseqs, jnp.int32)
        def vgru_w(v):
            l0 = dict(layers[0]); l0["wi"] = v
            return vgru_final_cols_pallas([l0] + list(layers[1:]), aln_p, col_valid)
        ms = amortized_ms(vgru_w, layers[0]["wi"], repeats=3)
        log(f"vgru (pallas) 3000x768: {ms:.1f} ms")

    # hgru + coord_gru (rgru kernel) at the long bucket
    from dmpfold2_tpu.models import gruresnet
    seqemb = jnp.asarray(rng.normal(size=(1, l_pad, 512)), jnp.float32)


if __name__ == "__main__":
    main()
