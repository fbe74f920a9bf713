#!/usr/bin/env python3
"""Standalone probe: why does the windowed row scatter-add cost ~40
ms/frame under vmap (hardware r4, abl compact 62.0 vs compact/slide
22.0 ms/frame)?  Compares the SAME row-placement job three ways:

  * vmap   — jax.vmap of the per-lane scatter (what _compact_chunks
             pays inside _decode_device_batch today)
  * map    — jax.lax.map over lanes (sequential sub-programs)
  * flat   — ONE global scatter with lane-offset indices (indices stay
             sorted because each lane's rows land in its own stride)

Also times jnp.cumsum vs scans.blocked_scan on the same batch shape
(the r1 "cummax ~0" op-table entry was floor-masked — fetch-RTT
discovery).  All data is generated on device; checksums must agree.
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from qoi_tpu.utils import profiling  # noqa: E402

profiling.enable_compile_cache()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B, nseg, seg = 16, 3584, 4096
m = nseg * seg
dn = jax.lax.ScatterDimensionNumbers(
    update_window_dims=(1,), inserted_window_dims=(),
    scatter_dims_to_operand_dims=(0,))
CLIP = jax.lax.GatherScatterMode.CLIP


def data():
    rows = (jax.lax.broadcasted_iota(jnp.int32, (B, nseg, seg), 2)
            ^ (jax.lax.broadcasted_iota(jnp.int32, (B, nseg, seg), 1) * 7))
    cnt = 819 + (jax.lax.broadcasted_iota(jnp.int32, (B, nseg), 1)
                 * 1103515245 & 0x7FF)
    base = jnp.cumsum(cnt, axis=1) - cnt
    return rows, base


def one(r, b):
    return jax.lax.scatter_add(
        jnp.zeros((m + seg,), jnp.int32), b[:, None], r, dn,
        indices_are_sorted=True, unique_indices=False, mode=CLIP)


@jax.jit
def s_vmap():
    rows, base = data()
    return jnp.sum(jax.vmap(one)(rows, base))


@jax.jit
def s_map():
    rows, base = data()
    return jnp.sum(jax.lax.map(lambda rb: one(*rb), (rows, base)))


@jax.jit
def s_flat():
    rows, base = data()
    stride = m + seg
    gbase = (base + stride * jax.lax.broadcasted_iota(
        jnp.int32, (B, nseg), 0)).reshape(-1)
    out = jax.lax.scatter_add(
        jnp.zeros((B * stride,), jnp.int32), gbase[:, None],
        rows.reshape(B * nseg, seg), dn,
        indices_are_sorted=True, unique_indices=False, mode=CLIP)
    return jnp.sum(out)


@jax.jit
def c_xla():
    rows, _ = data()
    flat = rows.reshape(B, m)
    return jnp.sum(jnp.cumsum(flat, axis=-1))


@jax.jit
def c_blocked():
    from qoi_tpu.ops import scans
    rows, _ = data()
    flat = rows.reshape(B, m)
    return jnp.sum(scans.blocked_scan(lambda a, b: a + b, flat))


def timeit(name, f):
    t0 = time.perf_counter()
    s = int(jax.device_get(f()))
    print(f"{name}: compile+run {time.perf_counter()-t0:.0f}s sum={s}",
          flush=True)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        int(jax.device_get(f()))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: min {min(ts)*1e3:.1f} ms "
          f"all {[f'{t*1e3:.0f}' for t in ts]}", flush=True)


print(f"device: {jax.devices()[0]}", flush=True)
for nm, f in (("scatter vmap", s_vmap), ("scatter map", s_map),
              ("scatter flat", s_flat), ("cumsum xla", c_xla),
              ("cumsum blocked", c_blocked)):
    timeit(nm, f)
