"""Hardware probe: column-tiled fused conv vs XLA conv at long row widths.

Round-4 verdict item 1: the 896-1536 residue buckets used to fall back to
the ~51%-of-peak XLA conv because one full output row overflowed VMEM.
This measures the column-tiled kernel (auto layout) against the XLA
conv+maxout at those widths, checks numerics on hardware (Mosaic compiles
differ from interpret mode), and optionally sweeps forced panel layouts.

Usage: python scripts/probe_conv_panels.py [L ...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_RPC_FLOOR = [0.0]


def timed(fn, *args):
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    float(f(*args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        times.append(time.perf_counter() - t0)
    return max(min(times) - _RPC_FLOOR[0], 0.0)


def main():
    import jax
    import jax.numpy as jnp

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".cache", "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")
    from dmpfold2_tpu.utils.timing import measure_rpc_floor

    _RPC_FLOOR[0] = measure_rpc_floor()
    log(f"rpc floor {_RPC_FLOOR[0]*1000:.1f} ms")

    from dmpfold2_tpu.kernels.conv_block import _layout, conv5x5_maxout

    sizes = [int(a) for a in sys.argv[1:]] or [736, 896, 1024, 1280, 1536]
    rng = np.random.default_rng(0)
    C, CO, pool = 128, 512, 4
    w = jnp.asarray(rng.normal(size=(5, 5, C, CO)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(CO,)) * 0.1, jnp.float32)

    def xla_conv(x):
        out = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1),
            ((2, 2), (2, 2)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16) + b.astype(jnp.bfloat16)
        return out.reshape(*out.shape[:3], CO // pool, pool).max(-1)

    for L in sizes:
        x = jnp.asarray(rng.normal(size=(1, L, L, C)), jnp.bfloat16)
        tall = L + 4
        layout = _layout(tall, L, CO, C, pool, False)
        flops = 2.0 * L * L * 25 * C * CO
        t_xla = timed(xla_conv, x)
        log(f"L={L}: XLA conv+maxout {t_xla*1000:7.2f} ms "
            f"({flops / t_xla / 197e12 * 100:5.1f}% peak)")
        try:
            t_fused = timed(lambda xx: conv5x5_maxout(xx, w, b, pool), x)
            # hardware numerics check (one-time): fused vs XLA fp32-acc ref
            got = np.asarray(conv5x5_maxout(x, w, b, pool), np.float32)
            ref = jax.lax.conv_general_dilated(
                x, w.astype(jnp.bfloat16), (1, 1), ((2, 2), (2, 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32) + b
            ref = np.asarray(
                ref.reshape(1, L, L, CO // pool, pool).max(-1), np.float32)
            err = np.abs(got - ref).max()
            log(f"L={L}: fused (auto {layout})   {t_fused*1000:7.2f} ms "
                f"({flops / t_fused / 197e12 * 100:5.1f}% peak)  "
                f"max|err| {err:.3f}  speedup {t_xla / t_fused:.2f}x")
        except Exception as exc:
            log(f"L={L}: fused FAILED: {str(exc)[:300]}")


if __name__ == "__main__":
    main()
