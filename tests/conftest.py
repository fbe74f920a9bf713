"""Test config: force JAX onto a virtual 8-device CPU platform.

This must run before the first `import jax` anywhere (SURVEY.md §4:
multi-host code paths are exercised in CI via
`xla_force_host_platform_device_count`; the same test bodies run unmodified
on a real TPU slice).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
