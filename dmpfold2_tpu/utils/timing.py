"""Shared benchmarking helpers for remote-device timing.

The remote-execution tunnel to the TPU adds a fixed per-dispatch RPC cost
(~28-33 ms measured) to every program launch; wall-clock timings of
single-kernel programs therefore measure the tunnel, not the device.
Benchmarks either amortize (many in-graph iterations per dispatch) or
subtract the floor measured here. One implementation so every probe and
the driver bench correct with the same methodology (bench.py,
scripts/profile_block.py, scripts/profile_train_parts.py,
scripts/probe_gemm_ceiling.py).
"""

from __future__ import annotations

import time


def measure_rpc_floor(reps: int = 5) -> float:
    """Seconds of fixed per-dispatch overhead: best-of-``reps`` wall-clock
    of a trivial jitted program (compile + warm excluded)."""
    import jax
    import jax.numpy as jnp

    one = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: jnp.sum(x * 2.0))
    float(f(one))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(one))
        times.append(time.perf_counter() - t0)
    return min(times)
