"""Hardware probe: training-step remat tiers vs micro-batch size.

Round-4 verdict item 4: micro-batch scaling was inverted (1.20 s/sample at
B=1, 1.26 at B=2, 1.63 at B=4 — crop 350, nloops 3, bf16 fused) because
only one remat tier applied globally. This measures every viable tier per
batch size, including the new hybrid "recycle_save_conv" (per-recycle
outer checkpoint + banked conv outputs inside the replayed pass), to set
train/step.py:_resolve_remat's policy from data.

Usage: python scripts/probe_remat_tiers.py [nloops] [crop]
"""

from __future__ import annotations

import json
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
    import dmpfold2_tpu.train.step as step_mod
    from dmpfold2_tpu.train.step import TrainBatch, make_optimizer, train_step

    nloops = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    crop = int(sys.argv[2]) if len(sys.argv) > 2 else 350
    nseqs = 512
    n_pad, l_pad = bucket_shape(nseqs, crop)
    params = get_bench_params()
    optimizer = make_optimizer(1e-4)
    opt_state = optimizer.init(params)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)

    # informative subset (each program is a multi-minute cold compile):
    # auto = the current policy's pick; recycle_save_conv = the hybrid
    # under test everywhere; plain recycle at B=2 separates the outer
    # checkpoint's cost from the save_conv inner win
    tier_plan = {1: ("auto", "recycle_save_conv"),
                 2: ("auto", "recycle", "recycle_save_conv"),
                 4: ("auto", "recycle_save_conv")}

    results = {}
    orig = step_mod._resolve_remat
    for bsz in (1, 2, 4):
        batch = TrainBatch(
            alnmat=jnp.asarray(rng.integers(0, 21, (bsz, n_pad, l_pad)), jnp.int32),
            targets=jnp.asarray(rng.normal(size=(bsz, l_pad, 5, 3)) * 4, jnp.float32),
            nseqs=jnp.full((bsz,), nseqs, jnp.int32),
            nres=jnp.full((bsz,), crop, jnp.int32),
        )
        for tier in tier_plan[bsz]:
            if tier == "auto":
                step_mod._resolve_remat = orig
                label = f"auto({orig(params, bsz, l_pad, nloops, True)})"
            else:
                step_mod._resolve_remat = lambda *a, t=tier, **k: t
                label = str(tier)
            try:
                t0 = time.perf_counter()
                _, _, m = train_step(params, opt_state, batch, key,
                                     optimizer=optimizer, nloops=nloops,
                                     precision="bf16", native_batch=True,
                                     fused_conv=True)
                float(m["loss"])
                compile_s = time.perf_counter() - t0
                times = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    _, _, m = train_step(params, opt_state, batch, key,
                                         optimizer=optimizer, nloops=nloops,
                                         precision="bf16", native_batch=True,
                                         fused_conv=True)
                    float(m["loss"])
                    times.append(time.perf_counter() - t0)
                best = min(times)
                results[f"B{bsz}_{label}"] = round(best, 3)
                log(f"B={bsz} tier={label}: {best:.3f} s/step "
                    f"({best / bsz:.3f} s/sample; compile+1st {compile_s:.0f}s)")
            except Exception as exc:
                results[f"B{bsz}_{label}"] = f"FAIL {str(exc)[:120]}"
                log(f"B={bsz} tier={label}: FAILED {str(exc)[:200]}")
            finally:
                step_mod._resolve_remat = orig
            # each (bsz, tier) is a distinct compiled program: clear live
            # buffers between configs so a failed/aborted one cannot leave
            # HBM fragmented for the next
            jax.clear_caches()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
