"""Pallas stream-packing kernel: staged chunk bytes -> contiguous stream.

The encoder's last stage (SURVEY.md §7.2 stage 5, reference write cursor
qoi.h:406-478) places each pixel's 0..6 staged bytes at its exclusive-
prefix-sum offset. The production XLA path (`ops/compact.compact_bytes6`)
does this with a two-tier segment sort over all 6N staged byte slots —
measured ~45 ms of the ~80 ms 4K frame (PERF_NOTES.md), the single
largest encode cost. This kernel replaces the byte-granular sort with:

  densify   one multi-operand sort of N *records* (not 6N bytes): each
            emitting pixel's bytes ride as two packed words, so the sort
            moves 3 i32 lanes per pixel instead of 6 keyed byte slots
  place     a Pallas kernel in the expand-kernel mold (kernels/expand.py):
            per-record WORD-granular contributions matched against output
            word ids by equality compares over scalar-prefetch-anchored
            fine windows — no data-dependent HBM access

Word decomposition: a record of len<=6 bytes at byte offset o spans at
most 3 output words w = o>>2, w+1, w+2. With s = (o & 3)*8 and the
record's bytes packed little-endian into lo (bytes 0-3) and hi (bytes
4-5, <= 16 bits), its contributions are

    c0 = lo << s
    c1 = (lo >>> (32-s)) | (hi << s)      (s=0: hi)
    c2 =  hi >>> (32-s)                   (nonzero only at s=24, len=6)

Each output byte is owned by exactly one record, so accumulating
contributions with int32 adds is carry-free and exact.

Window bounds need no content assumptions (unlike expand's chunk
arithmetic): densified records emit >= 1 byte each, so 128-record rows
advance byte offsets by >= 128 (word offsets by >= 32), giving
  * a 128-word output row draws from <= (512+6)/1 records ~ 4 rows,
  * rows whose records can reach word w (via +2 spill) have first-word
    > w - 2 - 32, i.e. one row below the <=-count anchor.

Output rows are (tile, subtile) word lanes (the lane-major idiom);
words bitcast to bytes in XLA afterwards. Grid steps whose tile starts
past the stream's total length skip their body (`pl.when`) and re-aim
the DMA at the previous step's blocks (index unchanged -> no refetch),
so worst-case capacity (6 B/px) costs only idle grid steps, not
compute: the tail runs at ~1-2 us/step instead of the accumulate cost.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.scans import exclusive_cumsum

_WROW = 128                 # records per row / lanes
_INF = np.int32(0x7FFFFFF0)


def _pbrows(tile: int) -> int:
    """Rows per DMA block: the adjacent block pair must cover a tile's
    contributing records. A tile of `tile` words = 4*tile bytes draws
    from <= 4*tile+2 records (each emits >= 1 byte) = tile/32 rows; the
    anchor row sits at worst at the end of the first block, so
    brows >= tile/32 + slack. Power of two keeps the anchor a shift."""
    b = 8
    while tile // 32 + 8 > b:
        b <<= 1
    return b


def _pfrows(sub: int) -> int:
    """Fine-window rows per subtile: 8 alignment slack + the row span of
    records contributing to `sub` words (rows advance word offsets by
    >= 32) + reach-back/boundary buffer, rounded up to a multiple of 8."""
    need = 8 + sub // 32 + 4
    return -(-need // 8) * 8


def _make_pack_kernel(tile: int, sub: int, dyn: bool = False):
    brows = _pbrows(tile)
    frows = _pfrows(sub)
    nsub = tile // sub
    ngmax = 2 * brows // 8

    def kernel(qb_ref, tot_ref, wp_a, wp_b, c0_a, c0_b, c1_a, c1_b,
               out_ref, swp, sc0, sc1):
        t = pl.program_id(0)
        base_t = t * tile

        # tiles past the stream total: skip all compute (the DMA block
        # index repeats the previous step's, so nothing is refetched;
        # output bytes past total are unspecified by contract)
        @pl.when(base_t < tot_ref[0])
        def _():
            swp[0:brows, :] = wp_a[...]
            swp[brows:2 * brows, :] = wp_b[...]
            sc0[0:brows, :] = c0_a[...]
            sc0[brows:2 * brows, :] = c0_b[...]
            sc1[0:brows, :] = c1_a[...]
            sc1[brows:2 * brows, :] = c1_b[...]
            rowfirst = swp[:, 0:1]                    # (2*brows, 1) nondecr.

            # fine-window anchors for ALL subtiles in one broadcast
            # compare (the expand-kernel idiom): count rows whose first
            # word offset is < base - 2 — records reaching word `base`
            # (via the +2 spill) all live in rows >= that count - 1
            bases = base_t + sub * jax.lax.broadcasted_iota(
                jnp.int32, (1, nsub), 1)
            cnts = jnp.sum((rowfirst <= bases - 3).astype(jnp.int32),
                           axis=0, keepdims=True)     # (1, nsub)
            if dyn:
                # rows past the subtile's LAST word contribute nothing:
                # the dynamic window ends at the <=-count for base+sub-1
                cnte = jnp.sum((rowfirst <= bases + (sub - 1)).astype(
                    jnp.int32), axis=0, keepdims=True)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, nsub), 1)

            for s in range(nsub):
                base_s = base_t + s * sub
                cnt = jnp.sum(jnp.where(lane == s, cnts, 0))
                q_col = base_s + jax.lax.broadcasted_iota(
                    jnp.int32, (sub, 1), 0)

                if not dyn:
                    # clip-then-multiply: the spelling Mosaic's
                    # divisibility analysis accepts for dynamic sublane
                    # starts
                    row0 = jnp.clip((cnt - 2) >> 3,
                                    0, (2 * brows - frows) // 8) * 8
                    fwp = swp[pl.ds(row0, frows), :]
                    fc0 = sc0[pl.ds(row0, frows), :]
                    fc1 = sc1[pl.ds(row0, frows), :]

                    acc = jnp.zeros((sub, _WROW), jnp.int32)
                    for r in range(frows):
                        wr = fwp[r:r + 1, :]          # (1, 128)
                        acc = acc + jnp.where(wr == q_col,
                                              fc0[r:r + 1, :], 0)
                        acc = acc + jnp.where(wr == q_col - 1,
                                              fc1[r:r + 1, :], 0)
                else:
                    # dynamic trip count over 8-row groups: typical
                    # content (~2 B/record) spans ~4 rows per subtile vs
                    # the worst-case-sized static window (frows); the
                    # slack is paid only by content that needs it.
                    # (Known slack: tail len-0 records all share
                    # wp = total>>2, so subtiles near the stream end
                    # count every tail row in cnte and accumulate zeros
                    # for up to ngmax groups — bounded, final-tile-only,
                    # measured negligible.)
                    ce = jnp.sum(jnp.where(lane == s, cnte, 0))
                    g0 = jnp.clip((cnt - 2) >> 3, 0, ngmax - 1)
                    ng = jnp.clip((ce - g0 * 8 + 7) >> 3, 1, ngmax - g0)

                    def body(g, acc, g0=g0, q_col=q_col):
                        r8 = jnp.clip(g0 + g, 0, ngmax - 1) * 8
                        bwp = swp[pl.ds(r8, 8), :]
                        bc0 = sc0[pl.ds(r8, 8), :]
                        bc1 = sc1[pl.ds(r8, 8), :]
                        for r in range(8):
                            wr = bwp[r:r + 1, :]
                            acc = acc + jnp.where(wr == q_col,
                                                  bc0[r:r + 1, :], 0)
                            acc = acc + jnp.where(wr == q_col - 1,
                                                  bc1[r:r + 1, :], 0)
                        return acc

                    acc = jax.lax.fori_loop(
                        0, ng, body, jnp.zeros((sub, _WROW), jnp.int32))

                out_ref[s, :] = jnp.sum(acc, axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("w_cap", "tile", "sub",
                                             "interpret", "window"))
def _place_words(wp, c0, c1, total, w_cap: int,
                 tile: int, sub: int, interpret: bool,
                 window: str = "static"):
    """Scatter word contributions to their word positions. wp: (R,) i32
    nondecreasing (pad with _INF); c0/c1: (R,) i32 contributions to
    words wp and wp+1 (the rare third word is pre-folded into the NEXT
    record's c0 by the caller). Returns (w_cap,) i32 words (valid while
    any contributor exists; beyond `total` words: unspecified)."""
    brows = _pbrows(tile)
    frows = _pfrows(sub)
    assert tile % sub == 0 and (tile // sub) % 8 == 0 and sub % 128 == 0
    assert frows <= 2 * brows
    r = wp.shape[0]
    t_out = -(-w_cap // tile)
    nblocks = -(-r // (_WROW * brows)) + 2
    rows_pad = nblocks * brows

    def pad_to(x, n, fill):
        return jnp.concatenate(
            [x, jnp.full((n - x.shape[0],), fill, x.dtype)])

    wp_r = pad_to(wp, rows_pad * _WROW, _INF).reshape(rows_pad, _WROW)
    c0_r = pad_to(c0, rows_pad * _WROW, 0).reshape(rows_pad, _WROW)
    c1_r = pad_to(c1, rows_pad * _WROW, 0).reshape(rows_pad, _WROW)

    # block anchor: the row before the first row whose first word offset
    # is >= base - 2 (records two words back can still spill into the
    # tile); method='sort' — the default 'scan' is a gather loop
    rowfirst = wp_r[:, 0]
    qs = jnp.arange(t_out, dtype=jnp.int32) * tile - 2
    bshift = brows.bit_length() - 1
    r0 = jnp.searchsorted(rowfirst, qs, method="sort").astype(jnp.int32)
    qb = jnp.minimum(jnp.maximum(r0 - 1, 0) >> bshift, nblocks - 2)
    tot_w = jnp.maximum((total + 3) >> 2, 1).astype(jnp.int32)[None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_out,),
        in_specs=[
            pl.BlockSpec((brows, _WROW), lambda t, q, tt: (q[t], 0)),
            pl.BlockSpec((brows, _WROW), lambda t, q, tt: (q[t] + 1, 0)),
            pl.BlockSpec((brows, _WROW), lambda t, q, tt: (q[t], 0)),
            pl.BlockSpec((brows, _WROW), lambda t, q, tt: (q[t] + 1, 0)),
            pl.BlockSpec((brows, _WROW), lambda t, q, tt: (q[t], 0)),
            pl.BlockSpec((brows, _WROW), lambda t, q, tt: (q[t] + 1, 0)),
        ],
        out_specs=pl.BlockSpec((tile // sub, sub), lambda t, q, tt: (t, 0)),
        scratch_shapes=[pltpu.VMEM((2 * brows, _WROW), jnp.int32)
                        for _ in range(3)],
    )
    return pl.pallas_call(
        _make_pack_kernel(tile, sub, dyn=(window == "dyn")),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (t_out * (tile // sub), sub), jnp.int32),
        interpret=interpret,
    )(qb, tot_w, wp_r, wp_r, c0_r, c0_r, c1_r, c1_r
      ).reshape(-1)[:w_cap]


def _record_words(staging6, lens):
    """Pack each pixel's staged bytes into (lo, hi|len<<16) words with
    bytes at or past len masked to zero (the staging contract covers
    only bytes < len)."""
    k, n = staging6.shape
    assert k == 6
    st = staging6.astype(jnp.uint32)
    lo = st[0] | st[1] << 8 | st[2] << 16 | st[3] << 24
    hi = st[4] | st[5] << 8
    l = lens.astype(jnp.int32)
    ls = (jnp.minimum(l, 3) << 3).astype(jnp.uint32)
    m0 = jnp.where(l >= 4, jnp.uint32(0xFFFFFFFF),
                   (jnp.uint32(1) << ls) - 1)
    m1 = jnp.where(l >= 6, jnp.uint32(0xFFFF),
                   jnp.where(l == 5, jnp.uint32(0xFF), jnp.uint32(0)))
    lo = (lo & m0).view(jnp.int32)
    hl = ((hi & m1) | l.astype(jnp.uint32) << 16).view(jnp.int32)
    return lo, hl


def _densify_sort(staging6, lens):
    """Emitting pixels -> dense records via ONE multi-operand sort at
    pixel granularity. Returns (off, lo, hi, len) dense arrays (N,):
    byte offset, bytes 0-3 packed LE, bytes 4-5, length; tail records
    (beyond the emitter count) have len 0 and off == total.

    Kept as the differential reference for `_densify_shift`: the sort
    measured ~26 ms real at 8.3M on v5e (PERF_NOTES), the shift version
    is pure fused elementwise work."""
    n = lens.shape[0]
    lo, hl = _record_words(staging6, lens)
    valid = lens > 0
    rc = exclusive_cumsum(valid.astype(jnp.int32))
    key = jnp.where(valid, rc, n)
    _, lo_d, hl_d = jax.lax.sort((key, lo, hl), num_keys=1)
    len_d = (hl_d >> 16) & 7
    off_d = exclusive_cumsum(len_d)
    return off_d, lo_d, (hl_d & 0xFFFF), len_d


#: pixels per densify segment: caps the slide distance at 12 bits so it
#: packs into the hi word (12 shift passes instead of log2 N) and the
#: segment rows assemble with one windowed scatter-add (the tier-2
#: idiom, ~free at ~2k rows)
_DENSIFY_SEG = 4096


def _densify_shift(staging6, lens, seg: int = 0):
    """Emitting pixels -> dense records via log-distance static-shift
    passes (stream compaction — no sort; the multi-operand densify sort
    measured ~26 ms real at 8.3M on v5e).

    Record keys (the running emitter count rc) are NONDECREASING in
    pixel order: densification never reorders records, it only slides
    each valid record left by d = (its index) - rc = the count of
    empty slots before it. Sliding by d's bits LSB-first is collision-
    free for valid records: after the k low bits, record e sits at
    pos_k(e) = i_e - (d_e mod 2^k), and for valid e < e'

        pos_k(e') - pos_k(e) >= (i_e' - i_e) - (d_e' - d_e)
                             =  #valid in [i_e, i_e')  >= 1.

    A slot whose record moves out is explicitly KILLED (len bits zeroed)
    unless a mover lands on it, so every record exists exactly once and
    a stale copy can never out-run a real one; empty slots never move in
    (the take is gated on the incoming len bits).

    Segmenting at `seg` pixels caps d < seg so it packs into hl's spare
    high bits — each pass is 2 planes of static row-slice + select,
    pure fused elementwise work. Per-segment dense rows then assemble at
    global record offsets with one windowed scatter-add (overlap-safe:
    dead slots are zeroed in both planes)."""
    n = lens.shape[0]
    seg = seg or _DENSIFY_SEG
    if n % seg or n < seg:
        seg = n
    nseg = n // seg
    assert seg <= 1 << 12, "d must fit hl bits 19..30"

    lo, hl = _record_words(staging6, lens)
    valid = (lens > 0).astype(jnp.int32)
    d = exclusive_cumsum(1 - valid.reshape(nseg, seg), axis=1)

    lo = lo.reshape(nseg, seg)
    hl = hl.reshape(nseg, seg) | (d << 19)
    lenm = jnp.int32(0x70000)

    def shift_rows(x, k):
        return jnp.concatenate(
            [x[:, k:], jnp.zeros((nseg, k), x.dtype)], axis=1)

    bit = 1
    while bit < seg:
        lo_s = shift_rows(lo, bit)
        hl_s = shift_rows(hl, bit)
        dbit = jnp.int32(bit << 19)
        mv_in = ((hl_s & dbit) != 0) & ((hl_s & lenm) != 0)
        mv_out = ((hl & dbit) != 0) & ((hl & lenm) != 0)
        lo = jnp.where(mv_in, lo_s, lo)
        hl = jnp.where(mv_in, hl_s, jnp.where(mv_out, 0, hl))
        bit <<= 1

    # per-segment dense rows -> global record offsets; zero dead slots in
    # BOTH planes so overlapping scatter windows only add zeros
    hl = hl & 0x7FFFF
    cnt = jnp.sum(valid.reshape(nseg, seg), axis=1)
    r0 = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                          jnp.cumsum(cnt)[:-1].astype(jnp.int32)])
    real = jnp.arange(seg, dtype=jnp.int32)[None, :] < cnt[:, None]
    lo = jnp.where(real, lo, 0)
    hl = jnp.where(real, hl, 0)

    if nseg == 1:
        lo_d, hl_d = lo[0], hl[0]
    else:
        dn = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1,), inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0,))
        zeros = jnp.zeros((n + seg,), jnp.int32)
        lo_d = jax.lax.scatter_add(
            zeros, r0[:, None], lo, dn, indices_are_sorted=True,
            unique_indices=False,
            mode=jax.lax.GatherScatterMode.CLIP)[:n]
        hl_d = jax.lax.scatter_add(
            zeros, r0[:, None], hl, dn, indices_are_sorted=True,
            unique_indices=False,
            mode=jax.lax.GatherScatterMode.CLIP)[:n]

    len_d = (hl_d >> 16) & 7
    off_d = exclusive_cumsum(len_d)
    return off_d, lo_d, (hl_d & 0xFFFF), len_d


def _prep_planes(off_d, lo_d, hi_d, total):
    """Word position + contribution planes from dense records. Tail
    records (len 0, contributions 0) land at wp = total>>2 — harmless
    and nondecreasing. (For subtiles near the stream end the dyn
    window's cnte counts every tail row, so its fori_loop accumulates
    up to ngmax groups of zeros there — wasted but bounded work on the
    final tile only; measured negligible vs capping ce by the real
    record count.) The rare third-word spill (only s=24, len=6
    records have one) folds into the NEXT record's c0: that record
    starts at off+6, i.e. its word is exactly wp+2, and the spilled
    byte is that word's lane 0, which the next record (starting at
    byte 1 of it) never owns. One sentinel slot at wp = total>>2
    catches a spill from a final record when every pixel emitted (no
    tail slot left to inherit it)."""
    s = ((off_d & 3) << 3).astype(jnp.uint32)
    lo_u = lo_d.view(jnp.uint32)
    hi_u = hi_d.view(jnp.uint32)
    c0 = (lo_u << s).view(jnp.int32)
    c1 = (((lo_u >> 1) >> (31 - s)) | (hi_u << s)).view(jnp.int32)
    c2 = ((hi_u >> 1) >> (31 - s)).view(jnp.int32)
    wp = jnp.concatenate([off_d >> 2, (total >> 2)[None]])
    c0 = jnp.concatenate([c0[:1], c0[1:] | c2[:-1], c2[-1:]])
    c1 = jnp.concatenate([c1, jnp.zeros((1,), jnp.int32)])
    return wp, c0, c1


@jax.jit
def densify_records(staging6, lens):
    """Program-A tail of the splitd two-program encode structure
    (PERF_NOTES.md "program-structure endgame"): emitting pixels ->
    dense records, pure fused elementwise work that shares a program
    with the staging stages. staging6: (6, N) uint8; lens: (N,) int32.
    Returns (off_d, lo_d, hi_d, total) for `place_records`."""
    off_d, lo_d, hi_d, _ = _densify_shift(staging6, lens)
    return off_d, lo_d, hi_d, jnp.sum(lens).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=(
    "capacity", "tile", "sub", "interpret", "window"))
def place_records(off_d, lo_d, hi_d, total, capacity: int, *,
                  tile: int = 2048, sub: int = 128,
                  interpret: bool = False, window: str = "dyn"):
    """Program B of the splitd encode structure: word/contribution plane
    prep + the placement kernel, from `densify_records`' materialized
    outputs. Returns (buffer (capacity,) uint8 valid in [0, total),
    total int32). The defaults are the measured-best bench geometry
    (dyn window: +2% over static, PERF_NOTES.md)."""
    assert capacity % 4 == 0
    wp, c0, c1 = _prep_planes(off_d, lo_d, hi_d, total)
    words = _place_words(wp, c0, c1, total, capacity // 4, tile, sub,
                         interpret, window=window)
    return jax.lax.bitcast_convert_type(words, jnp.uint8).reshape(-1), total


def compact_bytes6_pack(staging6, lens, capacity: int, *,
                        tile: int = 2048, sub: int = 128,
                        interpret: bool = False, densify: str = "shift",
                        barrier: bool = True, window: str = "static"):
    """Drop-in replacement for ops.compact.compact_bytes6 via the pack
    kernel. staging6: (6, N) uint8 byte planes; lens: (N,) int32 in
    [0, 6]; capacity: static output byte size (multiple of 4). Returns
    (buffer (capacity,) uint8 valid in [0, total), total int32)."""
    assert capacity % 4 == 0
    total = jnp.sum(lens).astype(jnp.int32)

    dense = {"shift": _densify_shift, "sort": _densify_sort}[densify]
    off_d, lo_d, hi_d, len_d = dense(staging6, lens)
    wp, c0, c1 = _prep_planes(off_d, lo_d, hi_d, total)

    if barrier:
        # pin the plane values so XLA cannot rematerialize the densify
        # chain once per pallas operand (fused-program remat penalty,
        # PERF_NOTES.md)
        wp, c0, c1, total = jax.lax.optimization_barrier(
            (wp, c0, c1, total))
    words = _place_words(
        wp, c0, c1, total, capacity // 4, tile, sub, interpret,
        window=window)
    out = jax.lax.bitcast_convert_type(words, jnp.uint8).reshape(-1)
    return out, total
