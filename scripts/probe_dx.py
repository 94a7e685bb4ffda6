"""Probe alternative dx (input-gradient) implementations for the fused
conv+maxout VJP (kernels/conv_block.py:_diff_bwd).

The backward's largest remaining line item is dx: scatter the cotangent to
the 4x conv channels, then a 5x5 conv 512->128 with flipped weights —
measured ~5.7 ms/block at L=352 vs ~2.1 ms speed-of-light (round-4
profile_block.py). Variants measured here:

  A. current: scatter to (B,L,L,512) + XLA conv with flipped/transposed w
  B. pool-decomposed: dx = sum_p conv(g * [idx==p], flip(w[..., p::4]).T)
     — four 128->128 convs; the 512-wide scattered tensor never exists
  C. 25-shifted GEMMs on the scattered tensor (the dw trick applied to dx)
     — expected memory-bound (25 HBM reads of the 512-channel cotangent)

Each variant is verified against A numerically, then timed with the
chained data-dependent methodology (RPC floor subtracted).

Usage: python scripts/probe_dx.py [L] [B]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

PEAK = 197e12
KSIZE = 5
PAD = 2
TARGET_FLOP = 10e12


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(f, *args, reps: int = 3) -> float:
    float(f(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    import jax
    import jax.numpy as jnp

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".cache", "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    from dmpfold2_tpu.utils.timing import measure_rpc_floor

    floor = measure_rpc_floor()
    log(f"per-dispatch RPC floor: {floor*1e3:.1f} ms (subtracted)")

    l = int(sys.argv[1]) if len(sys.argv) > 1 else 352
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    c_in, c_out, pool = 128, 512, 4
    group = c_out // pool
    rng = np.random.default_rng(0)
    dims = ("NHWC", "HWIO", "NHWC")

    g = jnp.asarray(rng.normal(size=(batch, l, l, group)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, pool, (batch, l, l, group)), jnp.int8)
    w = jnp.asarray(rng.normal(size=(KSIZE, KSIZE, c_in, c_out)) * 0.02,
                    jnp.float32)

    def scatter(g, idx):
        onehot = idx[..., None] == jnp.arange(pool, dtype=idx.dtype)
        g4 = jnp.where(onehot, g[..., None].astype(jnp.float32), 0.0)
        return g4.reshape(*g.shape[:-1], c_out).astype(jnp.bfloat16)

    def dx_a(g, idx, w):
        g4 = scatter(g, idx)
        w_hat = jnp.transpose(jnp.flip(w, (0, 1)), (0, 1, 3, 2)).astype(jnp.bfloat16)
        return jax.lax.conv_general_dilated(
            g4, w_hat, (1, 1), ((PAD, PAD), (PAD, PAD)),
            dimension_numbers=dims, preferred_element_type=jnp.float32)

    def dx_b(g, idx, w):
        acc = None
        for p in range(pool):
            gp = jnp.where(idx == p, g, jnp.bfloat16(0))
            wp = w[..., p::pool]  # (5,5,cin,group): old channel c = g*pool+p
            wp_hat = jnp.transpose(jnp.flip(wp, (0, 1)), (0, 1, 3, 2)).astype(jnp.bfloat16)
            d = jax.lax.conv_general_dilated(
                gp, wp_hat, (1, 1), ((PAD, PAD), (PAD, PAD)),
                dimension_numbers=dims, preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        return acc

    def dx_c(g, idx, w):
        g4 = scatter(g, idx)
        gp = jnp.pad(g4, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
        wb = w.astype(jnp.bfloat16)
        acc = jnp.zeros((batch * l * l, c_in), jnp.float32)
        for ky in range(KSIZE):
            for kx in range(KSIZE):
                gs = gp[:, 2 * PAD - ky : 2 * PAD - ky + l,
                        2 * PAD - kx : 2 * PAD - kx + l, :]
                acc = acc + jnp.dot(gs.reshape(batch * l * l, c_out),
                                    wb[ky, kx].T,
                                    preferred_element_type=jnp.float32)
        return acc.reshape(batch, l, l, c_in)

    # numeric check (fp32 accumulation on identical operands -> tight tol)
    ra = np.asarray(dx_a(g, idx, w))
    for name, fn in (("B", dx_b), ("C", dx_c)):
        rv = np.asarray(fn(g, idx, w))
        err = np.max(np.abs(rv - ra)) / (np.max(np.abs(ra)) + 1e-9)
        log(f"variant {name}: max rel err vs A = {err:.2e}")
        assert err < 5e-3, f"variant {name} mismatches A"

    flops = 2 * 25 * batch * l * l * c_in * c_out
    loops = max(1, int(TARGET_FLOP / flops))
    out = {"L": l, "B": batch, "loops": loops,
           "rpc_floor_ms": round(floor * 1e3, 2)}

    for name, fn in (("A_scatter_conv", dx_a), ("B_pool4_conv", dx_b),
                     ("C_shift_gemm", dx_c)):
        def chain(g, idx, w, fn=fn):
            def body(_, carry):
                # tie each iteration to the previous result (defeats CSE);
                # slice to the group-channel width so the broadcast add
                # typechecks for any c_in/c_out/pool config
                gg = g + carry[:1, :1, :1, :group].astype(jnp.bfloat16)
                return fn(gg, idx, w)
            acc = jax.lax.fori_loop(0, loops, body,
                                    jnp.zeros((batch, l, l, c_in), jnp.float32))
            return jnp.sum(acc)

        s = max(timeit(jax.jit(chain), g, idx, w) - floor, 1e-9) / loops
        out[name + "_ms"] = round(s * 1e3, 3)
        out[name + "_pct_peak"] = round(flops / s / PEAK, 4)
        log(f"  {name}: {s*1e3:.2f} ms ({flops/s/PEAK*100:.1f}% of peak)")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
