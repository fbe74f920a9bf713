#!/usr/bin/env python3
"""One-command HARDWARE differential for the Pallas kernels.

pytest forces CPU (tests/conftest.py), so the kernels' Mosaic lowering —
the fragile layer on this platform (PERF_NOTES.md "Pallas / Mosaic") —
is otherwise exercised only by bench.py's oracle gate. This script runs
the kernels non-interpret on the real chip and differentially checks:

  * pack placement kernel, window="static" AND "dyn", vs the XLA
    two-tier compaction on the adversarial geometries from
    tests/test_pack_kernel.py (incl. long zero gaps — the largest
    cnt/cnte anchor jumps the dyn fori_loop must survive)
  * expand kernel accum="wide" vs the XLA sorted-scatter expansion
  * full pipeline.encode_device_pack vs the C++ oracle (mixed content)

Exit 0 = all byte-/pixel-exact on hardware. Usage:  python tools/hwcheck.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _random_staging(n, rng, p_zero=0.5):
    lens = rng.choice([0, 1, 2, 3, 4, 5, 6], size=n,
                      p=[p_zero] + [(1 - p_zero) / 6] * 6)
    staging = rng.integers(0, 256, size=(6, n), dtype=np.uint8)
    col = np.arange(6)[:, None]
    staging = np.where(col < lens[None, :], staging, 0).astype(np.uint8)
    return staging, lens.astype(np.int32)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from qoi_tpu.utils import profiling
    profiling.enable_compile_cache()  # env vars alone are swallowed here

    from qoi_tpu import format as fmt, oracle
    from qoi_tpu.kernels import expand as kexpand, pack
    from qoi_tpu.models import pipeline
    from qoi_tpu.ops import compact
    from qoi_tpu.utils import testimages

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")
    if dev.platform != "tpu":
        log("NOT a TPU — this script checks Mosaic lowering; aborting")
        return 2

    rng = np.random.default_rng(42)
    n = 1 << 14
    cases = {}
    cases["mixed"] = _random_staging(n, rng)
    st6 = rng.integers(0, 256, size=(6, n), dtype=np.uint8)
    cases["all6"] = (st6, np.full(n, 6, np.int32))
    st, ln = _random_staging(n, rng, p_zero=0.0)
    keep = np.zeros(n, bool)
    keep[::3000] = True
    keep[n - 1] = True
    ln = np.where(keep, ln, 0).astype(np.int32)
    st = np.where(np.arange(6)[:, None] < ln[None, :], st, 0).astype(np.uint8)
    cases["zerogaps"] = (st, ln)

    fails = 0
    for name, (staging, lens) in cases.items():
        sd, ld = jnp.asarray(staging), jnp.asarray(lens)
        rbuf, rtot = compact.compact_bytes6(sd, ld, n * 6)
        rtot = int(jax.device_get(rtot))
        ref = np.asarray(jax.device_get(rbuf))[:rtot]
        for window in ("static", "dyn"):
            buf, tot = pack.compact_bytes6_pack(sd, ld, n * 6, window=window)
            tot = int(jax.device_get(tot))
            got = np.asarray(jax.device_get(buf))[:tot]
            ok = tot == rtot and np.array_equal(got, ref)
            log(f"pack {name}/{window}: {'OK' if ok else 'MISMATCH'}")
            fails += not ok

    # expand kernel: run records with mixed run lengths
    m = 1 << 14
    pix_per = rng.integers(1, 63, size=m).astype(np.int32)
    pix_off = np.concatenate([[0], np.cumsum(pix_per)[:-1]]).astype(np.int32)
    px32 = rng.integers(0, 1 << 32, size=m, dtype=np.uint64).astype(np.uint32)
    p_cap = 1 << 20
    ref_px = np.asarray(jax.device_get(kexpand.expand_px_xla(
        jnp.asarray(pix_off), jnp.asarray(px32), p_cap)))
    for acc in ("wide", "xw"):
        got_px = np.asarray(jax.device_get(kexpand.expand_px(
            jnp.asarray(pix_off), jnp.asarray(px32), p_cap, accum=acc)))
        ok = np.array_equal(got_px, ref_px)
        log(f"expand {acc}: {'OK' if ok else 'MISMATCH'}")
        fails += not ok
    # xw's rotate-window edges: max-sparsity 62-runs (anchor rows far
    # apart, offset o swings across the full [0, 8] range) and 5 B/px
    # density (span rows all live) — at BOTH the kernel-default and the
    # production decode geometry (t4096/nb4 + prefetched anchors, r5)
    for nm, (pp, mr) in {"sparse62": (62, 62), "dense1px": (1, 1)}.items():
        per = rng.integers(1, mr + 1, size=m).astype(np.int32)
        if pp == 62:
            per[:] = 62
        po2 = np.concatenate([[0], np.cumsum(per)[:-1]]).astype(np.int32)
        px2 = rng.integers(0, 1 << 32, size=m, dtype=np.uint64).astype(
            np.uint32)
        ref2 = np.asarray(jax.device_get(kexpand.expand_px_xla(
            jnp.asarray(po2), jnp.asarray(px2), p_cap)))
        for gname, kw in (("t1024", {}),
                          ("t4096nb4", {"tile": 4096, "nblocks": 4})):
            got2 = np.asarray(jax.device_get(kexpand.expand_px(
                jnp.asarray(po2), jnp.asarray(px2), p_cap, accum="xw",
                **kw)))
            ok = np.array_equal(got2, ref2)
            log(f"expand xw/{nm}/{gname}: {'OK' if ok else 'MISMATCH'}")
            fails += not ok

    # end-to-end splitd encode vs the oracle
    w, h = 512, 384
    desc = fmt.StreamDesc(w, h, 4)
    img = testimages.mixed(w, h, 4, seed=3)
    px4 = pipeline.force_rgba(img, desc)
    cap = pipeline.bucket_size(px4.shape[0])
    padded = np.zeros((cap, 4), np.uint8)
    padded[: px4.shape[0]] = px4
    buf, tot = pipeline.encode_device_pack(
        jnp.asarray(padded), jnp.int32(px4.shape[0]))
    tot = int(jax.device_get(tot))
    got = (fmt.pack_header(desc)
           + np.asarray(jax.device_get(buf))[:tot].tobytes() + fmt.TRAILER)
    ok = (not oracle.available()) or got == oracle.encode(img, desc)
    log(f"encode_device_pack vs oracle: {'OK' if ok else 'MISMATCH'}")
    fails += not ok

    # end-to-end wordsum encode with BOTH slide variants vs the oracle
    # (slide='kernel' is the production Mosaic path — kernels/slide.py)
    for sl in ("xla", "kernel"):
        words, tot = pipeline.encode_device_wordsum(
            jnp.asarray(padded), jnp.int32(px4.shape[0]), slide=sl)
        tot = int(jax.device_get(tot))
        got = (fmt.pack_header(desc)
               + np.asarray(jax.device_get(words)).view(np.uint8)[:tot]
               .tobytes() + fmt.TRAILER)
        ok = (not oracle.available()) or got == oracle.encode(img, desc)
        log(f"encode_device_wordsum slide={sl}: "
            f"{'OK' if ok else 'MISMATCH'}")
        fails += not ok

    print("HWCHECK " + ("PASS" if not fails else f"FAIL ({fails})"))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
