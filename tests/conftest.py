"""Test config: force JAX onto a virtual 8-device CPU platform.

Multi-host code paths are exercised in CI via
`xla_force_host_platform_device_count` (SURVEY.md §4); the same test bodies
run unmodified on a real TPU slice.

Note: the environment's sitecustomize registers a TPU PJRT plugin and
overrides the JAX_PLATFORMS env var, so forcing CPU must happen through
`jax.config` after import — env vars alone are silently ignored.
"""
import os

# NO JAX_COMPILATION_CACHE_DIR here: the suite must not read or write the
# persistent cache (see the note below the jax import) — these lines once
# set it and quietly contradicted that note.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NO persistent compile cache for the forced-CPU suite: XLA:CPU AOT
# entries record the COMPILE machine's features and loading them on a
# different host warns "could lead to execution errors such as SIGILL"
# — observed once as a transient wrong-encode in an abperf mini run.
# CPU compiles are cheap; only the TPU entry points (bench/abperf/cli/
# hwcheck via utils/profiling.enable_compile_cache) use the cache.


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_mmap_pressure():
    """Keep the process under vm.max_map_count (default 65530).

    Every XLA:CPU executable the session-lifetime jit caches retain maps
    its JIT'd code as r-xp/r--p/rw-p anonymous-map triplets; the full
    suite accumulates ~2.5k maps/minute and, at the kernel's default
    ceiling, mmap starts failing mid-compile — observed as a
    deterministic XLA compiler SIGSEGV ~190 tests in (round 4). Clearing
    the jit caches between modules releases the executables (and their
    maps); doing it only above a high-water mark avoids needless
    recompiles for short runs."""
    yield
    try:
        with open("/proc/self/maps") as f:
            n = sum(1 for _ in f)
    except OSError:  # non-Linux: no ceiling worth guarding
        return
    if n > 30_000:
        jax.clear_caches()
