"""Test configuration: force an 8-device virtual CPU platform.

The container's sitecustomize registers the TPU ('axon') backend and pins
JAX_PLATFORMS=axon before any test code runs, so plain env vars are too
late — we switch the platform through jax.config before any backend client
is instantiated. XLA_FLAGS is only read at client creation, so setting it
here still yields 8 virtual CPU devices for sharding tests.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# keep tests hermetic: API entry points (aln_to_coords, serve) enable the
# persistent compilation cache process-wide, which would fill the production
# cache with virtual-CPU executables — and the serialized write of some large
# donated-buffer programs aborts in native code
os.environ.setdefault("DMPFOLD2_TPU_NO_CACHE", "1")

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
# deterministic, highest-precision matmuls for parity tests on CPU
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    The full suite compiles hundreds of CPU programs; with all of them (and
    torch) resident, a later large compile segfaults inside XLA:CPU's
    backend_compile (reproduced at tests/test_train.py's backprop program —
    the same test passes standalone). Clearing per module keeps peak
    compiler/executable state bounded without losing intra-module caching.

    Set DMPFOLD2_TPU_KEEP_CACHES=1 to disable (used to re-probe whether the
    underlying XLA:CPU crash still reproduces on the current jaxlib — see
    tests/README_fragility.md for the investigation record).
    """
    yield
    if os.environ.get("DMPFOLD2_TPU_KEEP_CACHES") != "1":
        jax.clear_caches()


_exitstatus = [0]


def pytest_sessionfinish(session, exitstatus):
    _exitstatus[0] = int(exitstatus)


@pytest.hookimpl(trylast=True)  # let other plugins (e.g. pytest-cov) finalize
def pytest_unconfigure(config):
    """Skip the fragile native teardown after the full suite.

    With torch + jax (+ the container's axon PJRT plugin) loaded in one
    process, interpreter exit after the FULL suite has been seen to
    segfault in C++ static destructors even with every test green
    (individual files exit cleanly). unconfigure runs after the terminal
    summary, so hard-exit here with pytest's own status so a teardown
    crash can't masquerade as a test failure.

    Set DMPFOLD2_TPU_NO_HARD_EXIT=1 to disable (e.g. when embedding
    pytest.main() in a longer-lived process that must survive the run).
    """
    import sys

    if os.environ.get("DMPFOLD2_TPU_NO_HARD_EXIT") == "1":
        return
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(_exitstatus[0])
