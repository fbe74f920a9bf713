"""Test config: force JAX onto a virtual 8-device CPU platform.

Multi-host code paths are exercised in CI via
`xla_force_host_platform_device_count` (SURVEY.md §4); the same test bodies
run unmodified on a real TPU slice.

Note: the environment's sitecustomize registers a TPU PJRT plugin and
overrides the JAX_PLATFORMS env var, so forcing CPU must happen through
`jax.config` after import — env vars alone are silently ignored.
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NO persistent compile cache for the forced-CPU suite: XLA:CPU AOT
# entries record the COMPILE machine's features and loading them on a
# different host warns "could lead to execution errors such as SIGILL"
# — observed once as a transient wrong-encode in an abperf mini run.
# CPU compiles are cheap; only the TPU entry points (bench/abperf/cli/
# hwcheck via utils/profiling.enable_compile_cache) use the cache.
