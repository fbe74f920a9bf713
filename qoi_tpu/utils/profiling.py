"""Tracing / profiling / speed-of-light accounting (SURVEY §5.1).

The reference's only instrumentation is a nanosecond timer + warmup macro
(qoibench.c:33-88, 362-376). Here:

- `trace(path)` wraps a region in a `jax.profiler` trace (viewable in
  XProf/TensorBoard/Perfetto);
- `annotate(name)` adds named scopes so pipeline stages are attributable
  in profiles;
- `device_sync_time(fn)` times a device callable honestly: on this
  platform `block_until_ready` can return before execution finishes, so
  the only trustworthy sync is fetching an output scalar to the host;
- `encode_sol_model` / `decode_sol_model` compute the bytes-moved
  speed-of-light bound for a given image, the denominator for
  "fraction of roofline" reporting.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Profile a region into `logdir` (XProf format)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope for pipeline stages (shows up in device profiles)."""
    return jax.named_scope(name)


def enable_compile_cache(path: str = "/root/.cache/jax",
                         min_secs: float = 0.5) -> None:
    """Enable the persistent XLA compile cache via jax.config.

    CRITICAL on this platform: the JAX_COMPILATION_CACHE_DIR env var is
    swallowed by the environment's sitecustomize, so env-var-only setup
    (what bench/abperf did through round 3) never cached ANYTHING — every
    process re-paid every remote compile. Only `jax.config.update` takes
    effect (hardware-verified: env-only leaves the cache dir untouched,
    config.update writes entries). PERF_NOTES.md round-3.

    TPU-only: the remote compile service also serves XLA:CPU compiles,
    and its AOT entries record the COMPILE machine's CPU features —
    loading them on this host warns 'could lead to execution errors
    such as SIGILL' (observed once as a transient wrong encode). CPU
    compiles are cheap; don't cache them."""
    try:
        if jax.devices()[0].platform != "tpu":
            return
    except Exception:  # pragma: no cover - no backend at all
        return
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_secs)


def device_sync_time(fn: Callable[[], jax.Array], reps: int = 5) -> float:
    """Best-of-reps seconds for `fn`, forcing a host fetch per rep."""
    import numpy as np

    out = fn()
    np.asarray(jax.device_get(jax.tree.leaves(out)[-1]))  # warmup + sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.device_get(jax.tree.leaves(out)[-1]))
        best = min(best, time.perf_counter() - t0)
    return best


# -- speed-of-light models (bytes moved at minimum, HBM-bandwidth bound) ----

#: practical HBM bandwidth per chip, bytes/s (v5e ~819 GB/s peak)
HBM_BYTES_PER_S = 819e9


def encode_sol_model(n_px: int, channels: int, rate: float = 0.45,
                     bw: float = HBM_BYTES_PER_S) -> Dict[str, float]:
    """Minimum-traffic model for encode: read pixels once (4 B/px after
    RGBA forcing), write staging once and read it back for compaction
    (~6 B/px worst, rate-dependent typical), write the stream (~rate *
    channels B/px)."""
    read_px = 4 * n_px
    staging = 2 * 6 * n_px  # write + read
    out = rate * channels * n_px
    total = read_px + staging + out
    return {
        "bytes_moved": total,
        "sol_seconds": total / bw,
        "sol_mpps": (n_px / 1e6) / (total / bw),
    }


def decode_sol_model(n_px: int, channels: int, rate: float = 0.45,
                     bw: float = HBM_BYTES_PER_S) -> Dict[str, float]:
    """Minimum-traffic model for decode: read the stream, tokenize (touch
    bytes ~2x), resolve + write pixels (4 B/px)."""
    stream = rate * channels * n_px
    total = 3 * stream + 4 * n_px
    return {
        "bytes_moved": total,
        "sol_seconds": total / bw,
        "sol_mpps": (n_px / 1e6) / (total / bw),
    }


def scaling_efficiency(mpps_by_shards):
    """BASELINE's scaling metric: efficiency[s] = Mpx/s at s shards
    divided by (s x Mpx/s at 1 shard). mpps_by_shards: {shard_count:
    mpps}. Returns {shard_count: efficiency in [0, ~1]}; requires the
    1-shard entry."""
    base = mpps_by_shards[1]
    if base <= 0:
        raise ValueError("1-shard throughput must be positive")
    return {s: v / (s * base) for s, v in sorted(mpps_by_shards.items())}
