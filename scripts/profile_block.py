"""Single trunk-block backward decomposition at the training crop shape.

Apportions the ~20 ms/block backward (scripts/profile_train_parts.py):
fused conv+maxout VJP (dx / dw / scatter), instance norm, SCSE, dropout.

Usage: python scripts/profile_block.py [L]
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
    import jax
    import jax.numpy as jnp

    def scalar_fn(*a):
        out = fn(*a)
        return sum(jnp.sum(leaf.astype(jnp.float32))
                   for leaf in jax.tree.leaves(out))

    f = jax.jit(scalar_fn, static_argnums=static)
    float(f(*args))
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

    from dmpfold2_tpu.kernels.conv_block import conv5x5_maxout_diff
    from dmpfold2_tpu.models.trunk import block_params, resnet_block
    from dmpfold2_tpu.ops.norm import masked_instance_norm

    l_pad = int(sys.argv[1]) if len(sys.argv) > 1 else 352
    log(f"L = {l_pad}")
    rng = np.random.default_rng(0)
    bf16 = jnp.bfloat16

    x = jnp.asarray(rng.normal(size=(1, l_pad, l_pad, 128)), bf16)
    params = block_params(jax.random.PRNGKey(0), 128, 5, 0)
    w = params["maxout"]["w"].astype(jnp.float32)
    b = params["maxout"]["b"].astype(jnp.float32)

    # --- fused conv+maxout alone
    conv_loss = lambda xx, ww, bb: jnp.sum(
        conv5x5_maxout_diff(xx, ww, bb).astype(jnp.float32))

    log("=== conv5x5+maxout (fused custom VJP) ===")
    t_f = timed("fwd", conv_loss, x, w, b)
    t_g = timed("grad x", jax.grad(conv_loss, argnums=0), x, w, b)
    t_gw = timed("grad (x,w,b)", jax.grad(conv_loss, argnums=(0, 1, 2)), x, w, b)
    if t_f > 0:
        log(f"  -> grad-x/fwd {t_g / t_f:.2f}, grad-all/fwd {t_gw / t_f:.2f}")

    # --- instance norm alone
    norm_loss = lambda xx: jnp.sum(
        masked_instance_norm(xx.astype(jnp.float32),
                             jnp.ones((128,)), jnp.zeros((128,))))
    log("=== masked instance norm ===")
    t_f = timed("fwd", norm_loss, x)
    t_g = timed("grad", jax.grad(norm_loss), x)

    # --- whole block (training config: dropout on)
    key = jax.random.PRNGKey(1)

    def block_loss(p, xx):
        out = resnet_block(p, xx, mask=None, dropout_rng=key,
                           compute_dtype=bf16, fused_conv=True)
        return jnp.sum(out.astype(jnp.float32))

    log("=== full resnet block (dropout, fused) ===")
    t_f = timed("fwd", block_loss, params, x)
    t_g = timed("grad (params+x)", jax.grad(block_loss, argnums=(0, 1)),
                params, x)
    log(f"  -> bwd/fwd {t_g / t_f:.2f}")


if __name__ == "__main__":
    main()
