"""Persistent XLA compilation cache (compile once per machine, not per process).

The end-to-end fold compiles one sizeable XLA program per shape bucket
(minutes on remote-compile TPU transports). The CLI / API / server enable
this cache so a fresh process reuses previous compilations.
"""

from __future__ import annotations

import os

_enabled = False


def enable_persistent_cache(path: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    if os.environ.get("DMPFOLD2_TPU_NO_CACHE"):
        # opt-out (tests set this): cache writes of some very large CPU
        # executables abort inside native serialization, and hermetic test
        # runs shouldn't touch the production cache anyway
        return
    import jax

    path = (path or os.environ.get("DMPFOLD2_TPU_CACHE")
            or os.path.expanduser("~/.cache/dmpfold2_tpu/xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _enabled = True
