"""Strict-mode tiled QOI encode: ONE stream, pixels sharded over "seq".

This is the sequence-parallel path (SURVEY.md §5.7, §7.2 stage 5; BASELINE
configs 2 and 4): a single reference-compatible bitstream produced by many
devices, each owning a contiguous tile of the pixel stream. The four loop
carries of the reference encoder (qoi.h:406-478) cross tile boundaries as
tiny summaries over ICI collectives:

  px_prev   — each tile's last pixel, packed into the summary word
  run       — pending-run phase (int32 mod 62), composed by a replicated
              S-step scan over per-tile (all_eq, trail) summaries
  index[64] — last-writer table summaries, overwrite-monoid combined
  cursor    — per-tile byte totals, exclusive-summed into stream offsets

Phase A computes local summaries; ONE fused `all_gather` of a 132-word
packed summary per tile exchanges every carry at once (boundary pixel
included — no separate ppermute); phase B re-runs the data-parallel
stages with exact incoming state. A second, unavoidable `all_gather`
exchanges the per-tile byte totals (they exist only after phase B), so
the whole encode is exactly TWO collectives per step. The result is
byte-identical to the reference single-threaded encoder.
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

    # Phase A runs against a SEED incoming pixel: only local position
    # 0's eq bit depends on the true boundary pixel, and the replicated
    # compose below re-derives that bit exactly from the gathered
    # boundary words — so the boundary-pixel exchange (previously a
    # separate ppermute) rides the same fused all_gather as every other
    # carry and the whole phase-A exchange is ONE collective
    # (SURVEY §5.8 "all tile summaries in ONE fused collective").
    prev0 = jnp.concatenate([_SEED[None], px4[:-1]], axis=0)
    eq = jnp.all(px4 == prev0, axis=-1) | ~valid
    keys = table.hash64(px4)
    packed = table.pack_rgba(px4)
    _, (tbl, wr) = table.table_replay(keys, packed, write=~eq)
    last_noneq = scans.last_true_index(~eq)[-1]
    all_eq = last_noneq < 0
    trail = (b - 1) - last_noneq  # trailing run length (when not all_eq)

    # fused 132-word summary: [0] last pixel (packed u32);
    # [1] all_eq | trail << 1; [2:66] table values; [66:130] written
    # flags; [130] first pixel (packed u32); [131] first-pixel validity
    px_last = table.pack_rgba(px4[-1:])[0]
    first_w = table.pack_rgba(px4[:1])[0]
    summary = jnp.concatenate([
        px_last.view(jnp.int32)[None],
        (all_eq.astype(jnp.int32) | (trail << 1))[None],
        tbl.view(jnp.int32),
        wr.astype(jnp.int32),
        first_w.view(jnp.int32)[None],
        (n_valid > 0).astype(jnp.int32)[None],
    ])
    summaries = jax.lax.all_gather(summary, axis)            # (S, 132)

    lasts = summaries[:, 0].view(jnp.uint32)
    all_eqs = (summaries[:, 1] & 1) != 0
    trails = summaries[:, 1] >> 1
    tbls = summaries[:, 2:66].view(jnp.uint32)
    wrs = summaries[:, 66:130] != 0
    firsts = summaries[:, 130].view(jnp.uint32)
    havepx = summaries[:, 131] != 0

    # true position-0 eq bit per tile: first pixel == left neighbour's
    # last pixel (tile 0 compares against the seed — same as phase A's
    # assumption, so e0 == the phase-A bit there). Pad tiles (n_valid ==
    # 0) have eq forced true everywhere already and export no writes.
    seed_w = table.pack_rgba(_SEED[None])[0]
    prevs = jnp.concatenate([seed_w[None], lasts[:-1]])
    eq0s = firsts == prevs
    seed0s = firsts == seed_w                 # the bit phase A assumed

    # incoming boundary pixel for this tile's phase B
    prev_w = jnp.where(ax == 0, seed_w, prevs[ax])
    prev_in = (prev_w[None] >> jnp.array(
        [0, 8, 16, 24], jnp.uint32)).astype(jnp.uint8)

    # -- pending-run phase scan (replicated; S tiny steps), with the
    # position-0 eq bit corrected: positions >= 1 are prev-independent,
    # so "positions >= 1 all eq" == all_eq | (trail == b - 1), and the
    # true tile state is all-eq iff that holds AND e0.
    def rstep(r, x):
        ae, tr, e0, hv = x
        tail_eq = ae | (tr == b - 1)          # positions >= 1 all eq
        ae_t = tail_eq & (e0 | ~hv)           # pad tiles stay all-eq
        tr_t = jnp.where(tail_eq, b - 1, tr)  # break at 0, b-1 trailing
        return jnp.where(ae_t, (r + b) % fmt.RUN_CAP, tr_t % fmt.RUN_CAP), r

    _, r_ins = jax.lax.scan(rstep, jnp.int32(0),
                            (all_eqs, trails, eq0s, havepx))
    run_in = r_ins[ax]

    # -- exclusive overwrite-combine of table summaries (replicated)
    def tstep(c, x):
        ct, cw = c
        t, w = x
        return (jnp.where(w, t, ct), cw | w), c

    # position-0 write correction for the exported summaries. Phase A
    # evaluated position 0's eq against the SEED, not the true incoming
    # pixel, so per tile exactly two discrepancies are possible:
    #   * spurious write (first != seed but first == prev): phase A
    #     wrote (hash(first) -> first) where the true encoder writes
    #     nothing — SAFE: eq at 0 means the run invariant already put
    #     `first` in that slot via an earlier tile's write, so value and
    #     flag match the true compose (derivation in tests).
    #   * missed write (first == seed but first != prev): the true
    #     encoder writes the seed at slot hash(seed) = 53 BEFORE any
    #     other write in the tile — patch it in unless a later local
    #     write to slot 53 shadows it.
    seed_slot = int(fmt.hash_rgba(*fmt.SEED_PIXEL))
    missed = seed0s & ~eq0s & havepx                         # (S,)
    slot53 = jnp.arange(64) == seed_slot
    tbls = jnp.where(slot53[None, :] & missed[:, None] & ~wrs,
                     seed_w, tbls)
    wrs = wrs | (slot53[None, :] & missed[:, None])

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
