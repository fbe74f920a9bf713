"""Strict-mode tiled QOI encode: ONE stream, pixels sharded over "seq".

This is the sequence-parallel path (SURVEY.md §5.7, §7.2 stage 5; BASELINE
configs 2 and 4): a single reference-compatible bitstream produced by many
devices, each owning a contiguous tile of the pixel stream. The four loop
carries of the reference encoder (qoi.h:406-478) cross tile boundaries as
tiny summaries over ICI collectives:

  px_prev   — each tile's last pixel, shifted right one tile (`ppermute`)
  run       — pending-run phase (int32 mod 62), composed by a replicated
              S-step scan over per-tile (all_eq, trail) summaries
  index[64] — last-writer table summaries, overwrite-monoid combined
  cursor    — per-tile byte totals, exclusive-summed into stream offsets

Phase A computes local summaries; one `all_gather` of ~300 B/tile exchanges
them; phase B re-runs the data-parallel stages with exact incoming state.
The result is byte-identical to the reference single-threaded encoder.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import format as fmt
from ..models import pipeline
from ..ops import compact, scans, table
from . import sharding

_SEED = jnp.array(fmt.SEED_PIXEL, dtype=jnp.uint8)


def _tile_step(px4: jnp.ndarray, n_total: jnp.ndarray, axis: str):
    """Per-tile body run under shard_map. px4: (B, 4) local tile."""
    b = px4.shape[0]
    s = jax.lax.axis_size(axis)
    ax = jax.lax.axis_index(axis)

    io = jnp.arange(b, dtype=jnp.int32)
    n_valid = jnp.clip(n_total - ax * b, 0, b)  # trailing pad tiles emit nothing
    valid = io < n_valid

    # -- boundary pixel from the left neighbour (tile 0 keeps the seed)
    recv = jax.lax.ppermute(px4[-1], axis, [(i, i + 1) for i in range(s - 1)])
    prev_in = jnp.where(ax == 0, _SEED, recv)

    # -- phase A: local summaries (exact, given prev_in)
    prev = jnp.concatenate([prev_in[None], px4[:-1]], axis=0)
    eq = jnp.all(px4 == prev, axis=-1) | ~valid
    keys = table.hash64(px4)
    packed = table.pack_rgba(px4)
    _, (tbl, wr) = table.table_replay(keys, packed, write=~eq)
    last_noneq = scans.last_true_index(~eq)[-1]
    all_eq = last_noneq < 0
    trail = (b - 1) - last_noneq  # trailing run length (when not all_eq)

    # -- exchange: ~300 B per tile, one fused all_gather over ICI
    all_eqs = jax.lax.all_gather(all_eq, axis)
    trails = jax.lax.all_gather(trail, axis)
    tbls = jax.lax.all_gather(tbl, axis)
    wrs = jax.lax.all_gather(wr, axis)

    # -- pending-run phase scan (replicated; S tiny steps)
    def rstep(r, x):
        ae, tr = x
        return jnp.where(ae, (r + b) % fmt.RUN_CAP, tr % fmt.RUN_CAP), r

    _, r_ins = jax.lax.scan(rstep, jnp.int32(0), (all_eqs, trails))
    run_in = r_ins[ax]

    # -- exclusive overwrite-combine of table summaries (replicated)
    def tstep(c, x):
        ct, cw = c
        t, w = x
        return (jnp.where(w, t, ct), cw | w), c

    zero = (jnp.zeros((64,), jnp.uint32), jnp.zeros((64,), bool))
    _, (inc_ts, inc_ws) = jax.lax.scan(tstep, zero, (tbls, wrs))
    table_in = (inc_ts[ax], inc_ws[ax])

    # -- phase B: exact per-tile encode with incoming carries
    contains_last = ((n_total - 1) // b) == ax
    chunks = pipeline.encode_stage_chunks(
        px4, n_valid,
        prev_in=prev_in, run_in=run_in, table_in=table_in,
        contains_last=contains_last,
    )
    buf, total = compact.compact_bytes6(chunks.staging, chunks.lens, b * 6)
    total = total.astype(jnp.int32)

    # -- stream offsets: exclusive sum of tile byte counts
    totals = jax.lax.all_gather(total, axis)
    offset = jnp.sum(jnp.where(jnp.arange(s) < ax, totals, 0))
    return buf, total[None], offset[None]


@functools.partial(jax.jit, static_argnames=("mesh", "axis"))
def _encode_tiled_device(px4, n_total, *, mesh: Mesh, axis: str):
    fn = jax.shard_map(
        functools.partial(_tile_step, axis=axis),
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    return fn(px4, n_total)


def encode_tiled(pixels: np.ndarray, desc: fmt.StreamDesc, mesh: Mesh,
                 axis: str = sharding.SEQ_AXIS) -> bytes:
    """Encode one image as a single stream sharded over `axis` of `mesh`;
    byte-identical to the reference encoder (qoi.h:356)."""
    desc.validate()
    px4 = pipeline.force_rgba(pixels, desc)
    n = px4.shape[0]
    s = mesh.shape[axis]
    b = -(-n // s)
    b = max(b, 2)  # a 1-pixel tile breaks the px4[:-1] shift
    padded = np.zeros((s * b, 4), np.uint8)
    padded[:n] = px4

    x = jax.device_put(
        jnp.asarray(padded), NamedSharding(mesh, P(axis)))
    bufs, totals, offsets = _encode_tiled_device(
        x, jnp.int32(n), mesh=mesh, axis=axis)

    bufs = np.asarray(jax.device_get(bufs)).reshape(s, b * 6)
    totals = np.asarray(jax.device_get(totals))
    body = b"".join(bufs[i, : totals[i]].tobytes() for i in range(s))
    return fmt.pack_header(desc) + body + fmt.TRAILER
