"""Per-component forward vs backward timings at the training crop shape.

Isolates which operator's VJP makes the training step's backward ~5.7x its
forward (scripts/profile_train.py): trunk (fused vs XLA conv), MDS eigh,
coord-head biGRU, vertical MSA GRU (remat-chunked), and the residue biGRU.

Usage: python scripts/profile_train_parts.py [crop] [nseqs]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(label, fn, *args):
    import jax

    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        times.append(time.perf_counter() - t0)
    log(f"  {label}: {min(times) * 1000:.1f} ms")
    return min(times)


def main():
    import jax
    import jax.numpy as jnp

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".cache", "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    from bench import get_bench_params
    from dmpfold2_tpu.engine.buckets import bucket_shape
    from dmpfold2_tpu.models import geometry
    from dmpfold2_tpu.models import gru as gru_mod
    from dmpfold2_tpu.models.trunk import trunk_apply

    crop = int(sys.argv[1]) if len(sys.argv) > 1 else 350
    nseqs = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    n_pad, l_pad = bucket_shape(nseqs, crop)
    log(f"bucket: ({n_pad}, {l_pad})")

    params = get_bench_params()
    rng = np.random.default_rng(0)
    bf16 = jnp.bfloat16
    nres = jnp.asarray(crop, jnp.int32)

    # --- trunk fwd vs grad (wrt input AND params, as training does)
    x = jnp.asarray(rng.normal(size=(1, l_pad, l_pad, 955)), bf16)

    def trunk_loss(p, v, fused):
        out = trunk_apply(p, v, compute_dtype=bf16, fused_conv=fused,
                          remat=True)
        return jnp.sum(out.astype(jnp.float32))

    log("=== trunk (B=1, remat) ===")
    for fused, tag in (("norm", "fused"), (False, "xla")):
        t_f = timed(f"fwd {tag}", lambda v, fu=fused: trunk_loss(params["trunk"], v, fu), x)
        t_g = timed(f"grad {tag} (input+params)",
                    jax.grad(lambda p, v, fu=fused: trunk_loss(p, v, fu),
                             argnums=(0, 1)),
                    params["trunk"], x)
        log(f"  -> bwd/fwd ratio {t_g / t_f:.2f}")

    # --- MDS (eigh) fwd vs grad
    g = rng.normal(size=(l_pad, l_pad)).astype(np.float32)
    gram = jnp.asarray(g + g.T)

    log("=== MDS eigh (B=1) ===")
    mds = lambda d: jnp.sum(geometry.mds_coords(d, nres))
    timed("fwd", mds, gram)
    timed("grad", jax.grad(mds), gram)

    # --- coord-head biGRU (3 layers, input 520) fwd vs grad
    emb = jnp.asarray(rng.normal(size=(l_pad, 1, 520)), jnp.float32)

    def coord_head(p, v):
        return jnp.sum(gru_mod.bigru_stack(p, v, nres))

    log("=== coord biGRU (3-layer, L scan) ===")
    t_f = timed("fwd", lambda v: coord_head(params["coord_gru"], v), emb)
    t_g = timed("grad (input+params)",
                jax.grad(coord_head, argnums=(0, 1)), params["coord_gru"], emb)
    log(f"  -> bwd/fwd ratio {t_g / t_f:.2f}")

    # --- residue biGRU (hgru, 2-layer, input 22->512)
    hin = jnp.asarray(rng.normal(size=(l_pad, 1, 512)), jnp.float32)

    def hgru_loss(p, v):
        return jnp.sum(gru_mod.bigru_stack(p, v, nres))

    log("=== hgru (2-layer biGRU) ===")
    t_f = timed("fwd", lambda v: hgru_loss(params["hgru"], v), hin)
    t_g = timed("grad (input+params)",
                jax.grad(hgru_loss, argnums=(0, 1)), params["hgru"], hin)
    log(f"  -> bwd/fwd ratio {t_g / t_f:.2f}")

    # --- vertical GRU (remat-chunked) fwd vs grad
    aln = jnp.asarray(rng.integers(0, 21, (n_pad, l_pad)), jnp.int32)
    oh = jnp.asarray(aln[..., None] == jnp.arange(22), jnp.float32)
    nseqs_s = jnp.asarray(nseqs, jnp.int32)

    def vgru_loss(p, v):
        out = gru_mod.unigru_stack_final(p, v, valid_len=nseqs_s,
                                         remat_chunk=128)
        return jnp.sum(out)

    log(f"=== vertical GRU ({n_pad} rows, remat_chunk=128) ===")
    t_f = timed("fwd", lambda v: vgru_loss(params["vgru"], v), oh)
    t_g = timed("grad (input+params)",
                jax.grad(vgru_loss, argnums=(0, 1)), params["vgru"], oh)
    log(f"  -> bwd/fwd ratio {t_g / t_f:.2f}")


if __name__ == "__main__":
    main()
