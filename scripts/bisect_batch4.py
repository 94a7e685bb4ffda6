"""Root-cause probe: micro-batch >= 4 crop-350 training-step compile failure.

Round 3 recorded an HTTP 500 from the remote compile helper when compiling
the bf16 crop-350 training step at micro-batch 4 (PERFORMANCE.md), leaving
batch scaling beyond 2 unverified. This script bisects the configuration
axes one at a time — batch size, remat mode, fused conv, nloops, crop —
compiling (and running once) each variant with a fresh subprocess-free
jit call, and records which succeed.

Usage: python scripts/bisect_batch4.py [quick|full]
Writes one JSON line per variant to stdout; human logs to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def try_step(params, *, batch_size, nloops, crop, nseqs, fused, remat,
             refine_steps=100):
    import jax
    import jax.numpy as jnp

    from dmpfold2_tpu.engine.buckets import bucket_shape
    from dmpfold2_tpu.train import step as step_mod
    from dmpfold2_tpu.train.step import TrainBatch, make_optimizer, train_step

    n_pad, l_pad = bucket_shape(nseqs, crop)
    rng = np.random.default_rng(0)
    batch = TrainBatch(
        alnmat=jnp.asarray(rng.integers(0, 21, (batch_size, n_pad, l_pad)),
                           jnp.int32),
        targets=jnp.asarray(rng.normal(size=(batch_size, l_pad, 5, 3)) * 4,
                            jnp.float32),
        nseqs=jnp.full((batch_size,), nseqs, jnp.int32),
        nres=jnp.full((batch_size,), crop, jnp.int32),
    )
    optimizer = make_optimizer(1e-4)
    opt_state = optimizer.init(params)
    key = jax.random.PRNGKey(0)

    # pin the remat mode by patching the resolver (the step derives it from
    # shape; the bisect must control it independently)
    orig = step_mod._resolve_remat
    step_mod._resolve_remat = lambda *a, **k: remat
    try:
        t0 = time.perf_counter()
        _, _, m = train_step(params, opt_state, batch, key,
                             optimizer=optimizer, nloops=nloops,
                             refine_steps=refine_steps, precision="bf16",
                             native_batch=True, fused_conv=fused)
        loss = float(m["loss"])
        return {"ok": True, "compile_s": round(time.perf_counter() - t0, 1),
                "loss": round(loss, 4)}
    finally:
        step_mod._resolve_remat = orig


def main():
    import jax

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".cache", "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    from bench import get_bench_params

    params = get_bench_params()

    quick = (sys.argv[1:] or ["quick"])[0] == "quick"
    base = dict(crop=350, nseqs=512, fused=True, remat=True, nloops=3)
    variants = [
        dict(base, batch_size=4),                       # the failing config
        dict(base, batch_size=4, nloops=0),             # recycling out
        dict(base, batch_size=4, fused=False),          # Pallas VJP out
        dict(base, batch_size=4, crop=256),             # smaller pair maps
        dict(base, batch_size=8, crop=160, nseqs=256),  # batch wide, maps small
    ]
    if not quick:
        variants += [
            dict(base, batch_size=4, refine_steps=0),
            dict(base, batch_size=6),
            dict(base, batch_size=4, remat="save_conv"),
        ]

    for v in variants:
        label = json.dumps(v, sort_keys=True)
        log(f"--- {label}")
        try:
            res = try_step(params, **v)
        except Exception as exc:
            res = {"ok": False,
                   "error": f"{type(exc).__name__}: {str(exc)[:400]}"}
            log(traceback.format_exc()[-1500:])
        print(json.dumps({**v, **res}), flush=True)
        log(f"    -> {res}")
        jax.clear_caches()


if __name__ == "__main__":
    main()
