"""Substantiate the fused-conv MXU rate claims with measurements.

(Historical context: round 3 claimed a "~62% of peak practical ceiling" for
the kernel's band dots — an artifact of timing one kernel per dispatch over
the RPC tunnel. The corrected rates in PERFORMANCE.md come from this
probe.) Measures, on the attached TPU:

  1. raw XLA GEMMs at the kernel's band-dot shape (M = t_rows*l_al,
     K = KSIZE*c_in = 640, N = c_out = 512) and at square sizes up to 8k,
  2. the fused conv+maxout kernel itself at the throughput-bucket shapes
     (FLOP accounting: 25 * L^2 * c_in * c_out MACs per image),
  3. the XLA conv_general_dilated equivalent, for the fusion win.

Methodology: the remote tunnel adds a fixed per-dispatch RPC cost (~30 ms
measured below), far above a single kernel invocation — every timed program
chains `loops` data-dependent iterations so device time dominates, and the
separately-measured RPC floor is subtracted. v1 of this probe timed one
kernel per dispatch and measured only the tunnel.

Usage: python scripts/probe_gemm_ceiling.py
Writes a human-readable table to stderr and one JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

PEAK = 197e12  # v5e bf16 peak FLOP/s (utils/flops.py)
TARGET_FLOP = 20e12  # work per timed dispatch: ~0.2-1 s of device time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(f, *args, reps: int = 3) -> float:
    float(f(*args))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def rpc_floor() -> float:
    from dmpfold2_tpu.utils.timing import measure_rpc_floor

    return measure_rpc_floor()


def main():
    import jax
    import jax.numpy as jnp

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".cache", "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    out = {}

    floor = rpc_floor()
    out["rpc_floor_ms"] = round(floor * 1e3, 2)
    log(f"per-dispatch RPC floor: {floor*1e3:.1f} ms (subtracted below)")

    # 1. raw GEMM rates (bf16 in, fp32 accum — the kernel's dot config).
    # fori_loop with a data-dependent carry so iterations can't be elided
    # or overlapped into one wide GEMM.
    log("— raw XLA GEMM (bf16, fp32 accumulation) —")
    for m, k, n in [
        (20 * 96, 640, 512),    # band dot at bucket L=96, t=20
        (5 * 256, 640, 512),    # band dot at L=256, t=5
        (2048, 640, 512),
        (2048, 2048, 2048),
        (8192, 8192, 8192),
    ]:
        a = jnp.asarray(rng.normal(size=(m, k)) * 0.05, jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(k, n)) * 0.05, jnp.bfloat16)
        loops = max(1, int(TARGET_FLOP / (2 * m * k * n)))

        def many(a, b):
            def body(_, carry):
                # fold the carry into `a` cheaply to serialize iterations
                aa = a + carry[:1, :1].astype(jnp.bfloat16)
                return jnp.dot(aa, b, preferred_element_type=jnp.float32)
            acc = jax.lax.fori_loop(0, loops, body,
                                    jnp.zeros((m, n), jnp.float32))
            return jnp.sum(acc)

        f = jax.jit(many)
        s = max(timeit(f, a, b) - floor, 1e-9)
        rate = loops * 2 * m * k * n / s
        out[f"gemm_{m}x{k}x{n}"] = round(rate / PEAK, 4)
        log(f"  {m}x{k}x{n} (x{loops}): {rate/1e12:.1f} TF/s = "
            f"{rate/PEAK*100:.1f}% of peak")

    # 2+3. the fused kernel vs the XLA conv at bench shapes: chain
    # conv+maxout applications (output is (B, L, L, c_in) again)
    from dmpfold2_tpu.kernels.conv_block import conv5x5_maxout

    log("— fused conv+maxout kernel vs XLA conv (chained, RPC-corrected) —")
    dims = ("NHWC", "HWIO", "NHWC")
    for batch, l in [(16, 96), (1, 256), (1, 736)]:
        x = jnp.asarray(rng.normal(size=(batch, l, l, 128)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(5, 5, 128, 512)) * 0.02, jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(512,)) * 0.1, jnp.float32)
        flops = 2 * 25 * batch * l * l * 128 * 512
        loops = max(1, int(TARGET_FLOP / flops))

        def chain_fused(x, w, b):
            def body(_, cur):
                return conv5x5_maxout(cur, w, b)
            return jnp.sum(jax.lax.fori_loop(0, loops, body, x)
                           .astype(jnp.float32))

        def chain_xla(x, w, b):
            def body(_, cur):
                y = jax.lax.conv_general_dilated(
                    cur, w, (1, 1), ((2, 2), (2, 2)), dimension_numbers=dims,
                    preferred_element_type=jnp.float32) + b
                return jnp.max(y.reshape(*y.shape[:-1], 128, 4),
                               axis=-1).astype(jnp.bfloat16)
            return jnp.sum(jax.lax.fori_loop(0, loops, body, x)
                           .astype(jnp.float32))

        s_fused = max(timeit(jax.jit(chain_fused), x, w, b) - floor, 1e-9) / loops
        s_xla = max(timeit(jax.jit(chain_xla), x, w, b) - floor, 1e-9) / loops
        out[f"fused_B{batch}_L{l}_pct_peak"] = round(flops / s_fused / PEAK, 4)
        out[f"xla_B{batch}_L{l}_pct_peak"] = round(flops / s_xla / PEAK, 4)
        log(f"  B={batch} L={l} (x{loops}): fused {s_fused*1e3:.2f} ms "
            f"({flops/s_fused/PEAK*100:.1f}% peak)  |  XLA conv+max "
            f"{s_xla*1e3:.2f} ms ({flops/s_xla/PEAK*100:.1f}% peak)")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
