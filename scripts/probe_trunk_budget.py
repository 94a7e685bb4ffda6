"""Decompose one batched trunk pass at the throughput bucket.

profile_stages.py (round 5) showed the full trunk pass at 48.8 ms for
~33.4 ms of analytic FLOPs (68% of bf16 peak) while the fused conv kernel
alone measures 93-95% — so ~15 ms/pass hides in the input conv, the
per-block gating elementwise, the fp32 resinp materialization, or the
head conv. This measures each layer of composition separately (amortized
in-graph, RPC-floor-free) so the gap gets a name.

Usage: python scripts/probe_trunk_budget.py [batch] [L]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def amortized_ms(fn, x, repeats: int = 10) -> float:
    import jax
    import jax.numpy as jnp

    def body(carry, c):
        v, acc = carry
        out = fn(v + c * jnp.asarray(1e-30, v.dtype))
        acc = acc + jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32))
        return (v, acc), None

    @jax.jit
    def run(v):
        (_, acc), _ = jax.lax.scan(
            body, (v, jnp.float32(0.0)),
            jnp.arange(repeats, dtype=jnp.int32).astype(v.dtype))
        return acc

    float(run(x))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x))
        times.append(time.perf_counter() - t0)
    return min(times) / repeats * 1000


def main():
    import jax
    import jax.numpy as jnp

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".cache", "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    from bench import get_bench_params
    from dmpfold2_tpu.kernels.conv_block import (conv5x5_maxout,
                                                 conv5x5_maxout_stats)
    from dmpfold2_tpu.models.trunk import (_resnet_block_fused_norm, maxout2d,
                                           trunk_apply)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    l_pad = int(sys.argv[2]) if len(sys.argv) > 2 else 88
    params = get_bench_params()["trunk"]
    rng = np.random.default_rng(0)
    nres = jnp.full((batch,), l_pad - 6, jnp.int32)
    row = jnp.arange(l_pad)[None, :] < nres[:, None]
    mask = (row[:, :, None] & row[:, None, :])[..., None]

    x128 = jnp.asarray(rng.normal(size=(batch, l_pad, l_pad, 128)), jnp.bfloat16)
    blocks = params["blocks"]
    b0 = jax.tree.map(lambda a: a[0], blocks)

    flops_conv = 2.0 * batch * l_pad * l_pad * 25 * 128 * 512
    peak = 197e12

    # 1. bare fused conv kernel (no stats) x1 block
    ms = amortized_ms(lambda v: conv5x5_maxout(v, b0["maxout"]["w"],
                                               b0["maxout"]["b"], 4), x128)
    log(f"conv5x5_maxout (bare):        {ms:6.2f} ms "
        f"({flops_conv / (ms / 1e3) / peak * 100:5.1f}% peak)")

    # 2. with in-kernel stats (the inference path's kernel)
    ms = amortized_ms(lambda v: conv5x5_maxout_stats(
        v, b0["maxout"]["w"], b0["maxout"]["b"], b0["maxout"]["gamma"],
        b0["maxout"]["beta"], 4, nres)[0], x128)
    log(f"conv5x5_maxout_stats:         {ms:6.2f} ms "
        f"({flops_conv / (ms / 1e3) / peak * 100:5.1f}% peak)")

    # 3. full fused block (conv + absorbed norm + SCSE + residual + mask)
    ms = amortized_ms(lambda v: _resnet_block_fused_norm(b0, v, mask), x128)
    log(f"full fused block:             {ms:6.2f} ms "
        f"({flops_conv / (ms / 1e3) / peak * 100:5.1f}% peak)")

    # 4. 16 blocks via the production scan
    def blocks_only(v):
        def body(carry, bp):
            return _resnet_block_fused_norm(bp, carry, mask), None
        out, _ = jax.lax.scan(body, v, blocks)
        return out

    ms = amortized_ms(blocks_only, x128, repeats=3)
    log(f"16-block scan:                {ms:6.2f} ms "
        f"({16 * flops_conv / (ms / 1e3) / peak * 100:5.1f}% peak)")

    # 5. input maxout (1x1, 955 -> 128x3) from fp32 and bf16 inputs
    for dt, name in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        x955 = jnp.asarray(rng.normal(size=(batch, l_pad, l_pad, 955)), dt)
        ms = amortized_ms(lambda v: maxout2d(params["input"], v, pool=3,
                                             mask=mask,
                                             compute_dtype=jnp.bfloat16),
                          x955, repeats=5)
        fl = 2.0 * batch * l_pad * l_pad * 955 * 384
        log(f"input maxout ({name} in):      {ms:6.2f} ms "
            f"({fl / (ms / 1e3) / peak * 100:5.1f}% peak)")

    # 6. whole trunk_apply from fp32 and bf16 inputs
    for dt, name in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        x955 = jnp.asarray(rng.normal(size=(batch, l_pad, l_pad, 955)), dt)
        ms = amortized_ms(lambda v: trunk_apply(params, v, mask,
                                                compute_dtype=jnp.bfloat16,
                                                fused_conv="norm"),
                          x955, repeats=5)
        log(f"trunk_apply ({name} in):       {ms:6.2f} ms")


if __name__ == "__main__":
    main()
