#!/usr/bin/env python3
"""Headline benchmark: single-chip QOI encode throughput, 4K RGBA.

Mirrors the reference benchmark's metric (Mpixels/s, qoibench.c:340-357)
on BASELINE.json config 2 (single 4K RGBA image). The baseline denominator
is the measured single-core throughput of the reference encoder on this
machine (BASELINE.md: 163 Mpx/s).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpx/s", "vs_baseline": N}
Extra diagnostics go to stderr only.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# persistent compile cache: XLA compiles of the fused pipeline take minutes
# on this platform; cache hits make reruns start in seconds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

BASELINE_ENCODE_MPXS = 163.0  # BASELINE.md measured, qoi.h:356 loop, 1 core -O3

W, H = 3840, 2160
REPS = 20


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from qoi_tpu import format as fmt
    from qoi_tpu.models import pipeline
    from qoi_tpu.utils import testimages

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")

    desc = fmt.StreamDesc(W, H, 4)
    img = testimages.mixed(W, H, 4)
    px4 = pipeline.force_rgba(img, desc)
    n = px4.shape[0]

    x = jax.device_put(jnp.asarray(px4))
    n_valid = jnp.int32(n)

    fn = pipeline._encode_device  # already jitted

    # correctness gate: the timed path must produce a valid stream
    buf, total = fn(x, n_valid)
    total_host = int(jax.device_get(total))
    stream = (
        fmt.pack_header(desc)
        + np.asarray(jax.device_get(buf))[:total_host].tobytes()
        + fmt.TRAILER
    )
    try:
        from qoi_tpu import oracle

        if oracle.available():
            ref = oracle.encode(img, desc)
            if ref != stream:
                log("WARNING: benchmark stream mismatches oracle encode")
            else:
                log("verified: byte-identical to oracle encode")
    except Exception as e:  # pragma: no cover - bench must still report
        log(f"oracle verification skipped: {e}")

    # warmup (compile + first run discarded, like qoibench.c:362-376).
    # NOTE: every timed rep fetches a scalar output to the host — on this
    # platform block_until_ready can return before execution finishes, so
    # only a host fetch is a trustworthy sync point.
    int(jax.device_get(fn(x, n_valid)[1]))
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        buf, total = fn(x, n_valid)
        int(jax.device_get(total))
        times.append(time.perf_counter() - t0)
    dt = min(times)

    mpxs = (n / 1e6) / dt
    log(f"encode 4K RGBA: {dt * 1e3:.2f} ms/frame, {mpxs:.1f} Mpx/s, "
        f"{total_host / 1024:.0f} KiB stream ({100 * total_host / (n * 4):.1f}%)")

    print(json.dumps({
        "metric": "encode_4k_rgba_throughput",
        "value": round(mpxs, 1),
        "unit": "Mpx/s",
        "vs_baseline": round(mpxs / BASELINE_ENCODE_MPXS, 2),
    }))


if __name__ == "__main__":
    main()
