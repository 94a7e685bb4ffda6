"""Training-step decomposition on the real chip.

Same trick as profile_stages.py, applied to the jitted train step: nloops and
refine_steps are *static* for training (reverse-mode AD through the unrolled
recycle loop), so each variant compiles its own program, but the differences
still isolate stages:

  t(0, 0)             = features + GRUs + 1 trunk fwd+bwd + MDS + loss + Adam
  t(n, 0) - t(0, 0)   = n x (trunk + MDS + coord GRU) fwd+bwd   [recycle cost]
  t(n, m) - t(n, 0)   = 2 x m refine steps fwd+bwd              [refine cost]

plus eval-mode (no grad) variants for the forward:backward split.

Usage: python scripts/profile_train.py [nseqs] [crop]
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
    from dmpfold2_tpu.engine.buckets import bucket_shape
    from dmpfold2_tpu.train.step import TrainBatch, make_optimizer, train_step

    nseqs = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    crop = int(sys.argv[2]) if len(sys.argv) > 2 else 350

    params = get_bench_params()
    n_pad, l_pad = bucket_shape(nseqs, crop)
    log(f"bucket: ({n_pad}, {l_pad})")
    rng = np.random.default_rng(0)
    batch = TrainBatch(
        alnmat=jnp.asarray(rng.integers(0, 21, (1, n_pad, l_pad)), jnp.int32),
        targets=jnp.asarray(rng.normal(size=(1, l_pad, 5, 3)) * 4, jnp.float32),
        nseqs=jnp.full((1,), nseqs, jnp.int32),
        nres=jnp.full((1,), crop, jnp.int32),
    )
    optimizer = make_optimizer(1e-4)
    opt_state = optimizer.init(params)
    key = jax.random.PRNGKey(0)

    def t(nloops, refine_steps, train=True):
        def step():
            return train_step(params, opt_state, batch, key, optimizer=optimizer,
                              nloops=nloops, refine_steps=refine_steps,
                              train=train, precision="bf16",
                              native_batch=True, fused_conv=True)
        t0 = time.perf_counter()
        _, _, m = step()
        float(m["loss"])
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            _, _, m = step()
            float(m["loss"])
            times.append(time.perf_counter() - t0)
        best = min(times)
        log(f"  n={nloops} m={refine_steps} train={train}: {best:.3f}s "
            f"(first {compile_s:.1f}s)")
        return best

    log("=== train step (micro-batch 1, bf16, native+fused) ===")
    full = t(3, 100)
    norefine = t(3, 0)
    base = t(0, 0)
    log("=== eval (forward only) ===")
    e_full = t(3, 100, train=False)
    e_norefine = t(3, 0, train=False)
    e_base = t(0, 0, train=False)

    log("\n=== decomposition ===")
    log(f"full step:                 {full:.3f}s  (eval fwd {e_full:.3f}s, "
        f"bwd+opt {full - e_full:.3f}s)")
    log(f"per recycle fwd+bwd:       {(norefine - base) / 3 * 1000:.0f}ms "
        f"(fwd only {(e_norefine - e_base) / 3 * 1000:.0f}ms)")
    log(f"2x100 refine fwd+bwd:      {(full - norefine) * 1000:.0f}ms "
        f"(fwd only {(e_full - e_norefine) * 1000:.0f}ms)")
    log(f"base (feat+GRUs+1 trunk):  {base * 1000:.0f}ms "
        f"(fwd only {e_base * 1000:.0f}ms)")


if __name__ == "__main__":
    main()
