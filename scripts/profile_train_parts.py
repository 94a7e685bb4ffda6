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


def timed(label, fn, *args, static=()):
    """jit(fn) with every arg a real argument (params as closure constants
    would bake 35M weights into the program and stall the compile). The
    output is reduced to ONE scalar in-graph and fetched with float() —
    on the remote TPU platform block_until_ready does not synchronize;
    only a value fetch does (same reason bench.py times via float())."""
    import jax
    import jax.numpy as jnp

    def scalar_fn(*a):
        out = fn(*a)
        return sum(jnp.sum(leaf.astype(jnp.float32))
                   for leaf in jax.tree.leaves(out))

    f = jax.jit(scalar_fn, static_argnums=static)
    float(f(*args))  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        times.append(time.perf_counter() - t0)
    dev = max(min(times) - _RPC_FLOOR[0], 0.0)
    log(f"  {label}: {dev * 1000:.1f} ms device ({min(times) * 1000:.1f} ms wall)")
    return dev


_RPC_FLOOR = [0.0]


def measure_rpc_floor():
    from dmpfold2_tpu.utils.timing import measure_rpc_floor as _floor

    _RPC_FLOOR[0] = _floor()
    log(f"per-dispatch RPC floor: {_RPC_FLOOR[0] * 1000:.1f} ms (subtracted)")


def main():
    import jax
    import jax.numpy as jnp

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".cache", "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")
    measure_rpc_floor()

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

    trunk_grad = jax.grad(trunk_loss, argnums=(0, 1))

    log("=== trunk (B=1, remat) ===")
    # fused_conv=True is the training variant (conv5x5_maxout_diff custom
    # VJP); the fully-fused "norm" epilogue is inference-only
    for fused, tag in ((True, "fused"), (False, "xla")):
        t_f = timed(f"fwd {tag}", trunk_loss, params["trunk"], x, fused,
                    static=(2,))
        t_g = timed(f"grad {tag} (input+params)", trunk_grad,
                    params["trunk"], x, fused, static=(2,))
        if t_f > 0:
            log(f"  -> bwd/fwd ratio {t_g / t_f:.2f}")

    # --- MDS (eigh) fwd vs grad
    g = rng.normal(size=(l_pad, l_pad)).astype(np.float32)
    gram = jnp.asarray(g + g.T)

    log("=== MDS eigh (B=1) ===")
    mds = lambda d, nr: jnp.sum(geometry.mds_coords(d, nr))
    timed("fwd", mds, gram, nres)
    timed("grad", jax.grad(mds), gram, nres)

    # --- coord-head biGRU (3 layers, input 520) fwd vs grad
    emb = jnp.asarray(rng.normal(size=(l_pad, 1, 520)), jnp.float32)

    def bigru_loss(p, v, nr):
        return jnp.sum(gru_mod.bigru_stack(p, v, nr))

    bigru_grad = jax.grad(bigru_loss, argnums=(0, 1))

    log("=== coord biGRU (3-layer, L scan) ===")
    t_f = timed("fwd", bigru_loss, params["coord_gru"], emb, nres)
    t_g = timed("grad (input+params)", bigru_grad, params["coord_gru"], emb, nres)
    if t_f > 0:
        log(f"  -> bwd/fwd ratio {t_g / t_f:.2f}")

    # --- residue biGRU (hgru, 2-layer, input 512)
    hin = jnp.asarray(rng.normal(size=(l_pad, 1, 512)), jnp.float32)

    log("=== hgru (2-layer biGRU) ===")
    t_f = timed("fwd", bigru_loss, params["hgru"], hin, nres)
    t_g = timed("grad (input+params)", bigru_grad, params["hgru"], hin, nres)
    if t_f > 0:
        log(f"  -> bwd/fwd ratio {t_g / t_f:.2f}")

    # --- vertical GRU (remat-chunked) fwd vs grad
    aln = jnp.asarray(rng.integers(0, 21, (n_pad, l_pad)), jnp.int32)
    oh = jnp.asarray(aln[..., None] == jnp.arange(22), jnp.float32)
    nseqs_s = jnp.asarray(nseqs, jnp.int32)

    def vgru_loss(p, v, ns):
        out = gru_mod.unigru_stack_final(p, v, valid_len=ns, remat_chunk=128)
        return jnp.sum(out)

    vgru_grad = jax.grad(vgru_loss, argnums=(0, 1))

    log(f"=== vertical GRU ({n_pad} rows, remat_chunk=128) ===")
    t_f = timed("fwd", vgru_loss, params["vgru"], oh, nseqs_s)
    t_g = timed("grad (input+params)", vgru_grad, params["vgru"], oh, nseqs_s)
    if t_f > 0:
        log(f"  -> bwd/fwd ratio {t_g / t_f:.2f}")


if __name__ == "__main__":
    main()
