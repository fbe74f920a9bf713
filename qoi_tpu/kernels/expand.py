"""Pallas run-expansion kernel: per-byte decode results -> pixel plane.

The decode pipeline's last stage maps every output pixel p to the px of
its governing chunk (the last chunk start with pix_off <= p; reference
run semantics qoi.h:532-544). XLA has no fast primitive for that
transport on this TPU: scatter and gather both serialize at ~10 ms per
million elements (PERF_NOTES.md), which made run expansion ~230 ms of a
~375 ms 4K decode. This kernel does it with compares, selects and one
deferred lane reduction per 64-pixel subtile — no data-dependent HBM
access beyond block-granular DMA driven by scalar-prefetched anchors.

Key identity (telescoping in Z/2^32): with d[i] = px32[i] - px32[i-1]
(plain int32 wraparound, px32[-1] := seed),

    px32[j*(p)] = seed + sum_{i <= j*(p)} d[i]

where j*(p) = last byte with pix_off <= p. Since pix_off is
nondecreasing and every chunk start has a UNIQUE pixel offset (chunks
emit >= 1 px; chunk-tail bytes carry the next chunk's offset with
d = 0 there), the summand set {i : pix_off[i] <= p} telescopes, so

    out = cumsum(landed) + seed,   landed[p] = sum_i d[i] * [pix_off[i] == p]

The kernel computes only the `landed` delta plane (at most one nonzero
contributor per pixel); the global cumsum runs in XLA where it is
effectively free (PERF_NOTES op table). No per-channel SWAR isolation
is needed — the masked sums telescope to differences of pixel values.

Layout: byte records pack into rows of 64 positions,
row r = [ pix_off[64r : +64] | d[64r : +64] ] (128 int32 lanes).
Grid = one step per `tile`-pixel output tile; a scalar-prefetched block
anchor (sort-method searchsorted over per-ROW first offsets — the
default 'scan' method is a gather loop, slow here) aims two adjacent
`brows`-row blocks at the tile: the bytes whose offsets land in the
tile span < tile*5 + tail < 64*brows positions, so the dyadic block
pair always covers them. Both blocks land in a (2*brows, 128) VMEM
scratch. Fine-window anchors for ALL subtiles come from one broadcast
compare over the scratch's first-offset column (pix_off is globally
nondecreasing, so all bytes landing in a subtile live in rows
[r* - 1, r* + ceil(sub/12) + 1] of the pair, r* = count of rows whose
first offset is <= the subtile base — 64 bytes hold >= 12 chunks, each
advancing >= 1 px). Each 128-pixel subtile then slices an 8-aligned
24-row fine window, equality-masks offsets against its pixel ids, and
accumulates deltas — either in a (128, 64) register block reduced once
at the end (accum="sum"), or as a one-hot bf16 contraction against
byte-split deltas on the MXU (accum="dot"). Output rows are
(tile, subtile) pairs with PIXELS ON LANES — a (pixels, 1) output
would pad its 1-lane minor dim 128x in HBM (PERF_NOTES lane-padding
trap) and cost more than the compute.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import format as fmt
from ..ops import scans

_ROW = 64           # byte positions per record row
_RLANES = 128       # row lanes: po 64 | d 64
_TILE = 1024        # output pixels per grid step
_SUB = 128          # pixels per subtile (lanes of one output row)
_INF = np.int32(0x7FFFFFF0)


def _brows(tile: int) -> int:
    """Rows per DMA block: the adjacent block pair must cover a tile's
    landing bytes (<= 5*tile + tail positions from the first landing
    byte), and _ROW * brows must stay a power of two so the searchsorted
    anchor is a plain shift. Grid steps scale as 1/tile while the DMA
    volume per step scales as tile, so total DMA volume is constant
    (~80 B/px) — bigger tiles purely amortize the ~5-7 us per-step
    grid/DMA-issue overhead (PERF_NOTES.md)."""
    b = 128
    while tile * 5 + 8 > _ROW * b:
        b <<= 1
    return b


def _frows(sub: int) -> int:
    """Fine-window rows per subtile: 8 alignment slack + the rows the
    sub's landing bytes can span (every 64-byte row holds >= 12 chunk
    starts, each advancing >= 1 px) + 1, rounded up to a multiple of 8."""
    need = 8 + -(-sub // 12) + 2
    return -(-need // 8) * 8

_WROW = 128         # byte positions per row, wide layout (full vreg lanes)


def _wbrows(tile: int) -> int:
    """Wide-layout rows per DMA block (same coverage bound as _brows,
    128 positions per row, power of two for the shift anchor)."""
    b = 64
    while tile * 5 + 8 > _WROW * b:
        b <<= 1
    return b


def _wspan_rows(tile: int) -> int:
    """Rows a tile's landing bytes can span in the wide layout: the
    bytes live within 5*tile + 8 positions of the first landing byte
    (<= 5 B/px worst case), which crosses at most that many row
    boundaries + the partial first and last rows."""
    return -(-(tile * 5 + 8) // _WROW) + 2


def _wblk(tile: int, nblocks: int) -> int:
    """Rows per DMA block for an `nblocks`-block window (power of two so
    the searchsorted anchor is a shift). The anchor row r0 - 1 sits
    anywhere inside the FIRST block, so coverage needs
    (blk - 1) + span <= nblocks * blk, i.e. (nblocks - 1) * blk >=
    span - 1. More, smaller blocks waste less DMA on the anchor's
    block-granular alignment: nblocks=2 -> 128 rows total at tile 1024
    (the r2 shape), nblocks=4 -> 64 rows — half the HBM traffic per
    grid step for the same correctness envelope."""
    span = _wspan_rows(tile)
    blk = 8  # minimum: (blk, 128) i32 DMA blocks need 8-row sublane tiles
    while (nblocks - 1) * blk < span - 1:
        blk <<= 1
    return blk


def _wfrows(sub: int) -> int:
    """Wide-layout fine-window rows: 8 alignment slack + span (every
    128-byte row holds >= 25 chunk starts, each advancing >= 1 px) + 2."""
    need = 8 + -(-sub // 25) + 2
    return -(-need // 8) * 8


def _wbrows_dense(tile: int) -> int:
    """Dense-record blocks: every row is a CHUNK record advancing >= 1
    px (the chunk-compacted input, decode_v3._compact_chunks), so a
    tile's landing records span <= tile + tail rows-positions — 4x less
    DMA per step than the byte-granular 5*tile bound."""
    b = 8
    while tile + 8 > _WROW * b:
        b <<= 1
    return b


def _wfrows_dense(sub: int) -> int:
    """Dense-record fine window: every 128-record row advances >= 128
    px, so a subtile's landing records span ceil(sub/128) rows — at
    sub=512 the window is 16 rows for 512 px (4x fewer accumulate ops
    per pixel than the byte-granular 16 rows per 128 px)."""
    need = 8 + -(-sub // _WROW) + 2
    return -(-need // 8) * 8


_SEED32 = np.int32(np.uint32(
    fmt.SEED_PIXEL[0] | fmt.SEED_PIXEL[1] << 8
    | fmt.SEED_PIXEL[2] << 16 | fmt.SEED_PIXEL[3] << 24).view(np.int32))


def _make_kernel(tile: int, sub: int, accum: str = "sum"):
    frows = _frows(sub)
    brows = _brows(tile)

    nsub = tile // sub

    def kernel(qb_ref, rec_a, rec_b, out_ref, win):
        t = pl.program_id(0)
        base_t = t * tile
        win[0:brows, :] = rec_a[...]
        win[brows:2 * brows, :] = rec_b[...]
        rowfirst = win[:, 0:1]                       # (2*brows, 1) nondecr.

        # fine-window anchors for ALL subtiles in one vector op: count
        # rows whose first offset is <= each subtile base. A per-subtile
        # (2*brows, 1) reduction costs O(brows) narrow-vector work per
        # subtile (made bigger blocks slower: 65 -> 83 ms, 1k -> 8k
        # tile); an XLA-side searchsorted prefetch is worse still under
        # vmap (its 'scan' method is a gather loop). One broadcast
        # compare + column sum amortizes the narrow shape across nsub.
        bases = base_t + sub * jax.lax.broadcasted_iota(
            jnp.int32, (1, nsub), 1)
        cnts = jnp.sum((rowfirst <= bases).astype(jnp.int32),
                       axis=0, keepdims=True)        # (1, nsub)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, nsub), 1)

        for s in range(nsub):
            base_s = base_t + s * sub
            # rows whose first offset is <= base_s: with r* = cnt - 1,
            # all bytes landing in the subtile live in rows
            # [r* - 1, r* + ceil(sub/12) + 1] (a chunk start with offset
            # == base_s can sit one row earlier, its tail bytes carrying
            # the same offset into row r*; rows advance offsets by >= 12
            # px — >= 12 chunk starts per 64 bytes)
            cnt = jnp.sum(jnp.where(lane == s, cnts, 0))
            # Mosaic must statically prove the sublane start is a
            # multiple of 8: `x * 8` AFTER the clip is the spelling its
            # divisibility analysis accepts (`x << 3` is not);
            # floor-align(r* - 1) keeps the window inside the scratch
            row0 = jnp.clip((cnt - 2) >> 3, 0, (2 * brows - frows) // 8) * 8

            fine = win[pl.ds(row0, frows), :]         # (frows, 128)
            p_col = base_s + jax.lax.broadcasted_iota(
                jnp.int32, (sub, 1), 0)

            if accum == "noop":
                # ABLATION ONLY (wrong results): keeps the grid, DMA,
                # anchor math and window slice, drops the accumulate —
                # bounds the accumulate's share of kernel time
                out_ref[s, :] = jnp.sum(fine[0:8, 0:sub], axis=0)
            elif accum == "sum":
                acc = jnp.zeros((sub, _ROW), jnp.int32)
                for r in range(frows):
                    po_r = fine[r:r + 1, 0:_ROW]      # (1, 64)
                    d_r = fine[r:r + 1, _ROW:2 * _ROW]
                    acc = acc + jnp.where(po_r == p_col, d_r, 0)

                # one output row per subtile, pixels on LANES: a
                # (pixels, 1) output pads its 1-lane minor dim 128x in
                # HBM and the padded writes alone cost more than compute
                out_ref[s, :] = jnp.sum(acc, axis=1)
            else:  # accum == "dot": MXU one-hot contraction
                # the VPU cmp+select+add chain above is the kernel's
                # dominant cost (3 ops x 8 vregs x frows per subtile,
                # tile-size independent — measured ~44 ms real at 16.7M
                # bytes). Here each row's select+add+final-reduce moves
                # to the MXU: one-hot match matrix (bf16, exact for 0/1)
                # contracted against the delta's 4 unsigned byte planes
                # (each 0..255, exact in bf16; at most one nonzero
                # product per pixel so the f32 accumulator is exact).
                accf = jnp.zeros((8, sub), jnp.float32)
                for r in range(frows):
                    po_r = fine[r:r + 1, 0:_ROW]      # (1, 64)
                    d_r = fine[r:r + 1, _ROW:2 * _ROW]
                    # the i1 compare mask must be consumed at the i32
                    # tiling: a direct bf16 select relayouts the mask
                    # (8,128)->(16,128), which Mosaic rejects ("Invalid
                    # relayout ... replicated in destination"); select
                    # 0/1 in i32 first, then convert
                    mi = jnp.where(po_r == p_col, 1, 0)   # (sub, 64) i32
                    m16 = mi.astype(jnp.bfloat16)
                    # byte planes via one broadcast shift: rows k<4 hold
                    # (d >> 8k) & 0xFF, rows 4..7 are zero. A concat of
                    # per-plane (1, 64) slices is a Mosaic trap ("offset
                    # mismatch on non-concat dimension": the operands sit
                    # at different sublane offsets); the iota-shift
                    # spelling is plain elementwise ops
                    krow = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
                    d8i = jnp.where(
                        krow < 4,
                        (d_r >> (jnp.minimum(krow, 3) * 8)) & 0xFF, 0)
                    d8 = d8i.astype(jnp.bfloat16)     # (8, 64)
                    # contract the 64-byte axis of both operands: the
                    # result lands byte-planes-on-sublanes, px-on-lanes
                    accf = accf + jax.lax.dot_general(
                        d8, m16, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (8, sub)
                b = accf.astype(jnp.int32)
                out_ref[s, :] = (b[0] | (b[1] << 8) | (b[2] << 16)
                                 | (b[3] << 24))

    return kernel


def _wspan_sub(sub: int) -> int:
    """Exact landing-row span of one subtile's bytes in the wide layout:
    with r* = last row whose first offset <= the subtile base, rows
    r*+1+k have first offsets > base + 25k (>= 25 chunk starts per
    128-byte row, each advancing >= 1 px), so landing rows stop at
    k = ceil(sub/25) - 1; plus the defensive r*-1 start row (a start
    with offset == base whose tail bytes carry base+npix into r*)."""
    return -(-sub // 25) + 2


def _make_wide_kernel(tile: int, sub: int, dyn: bool,
                      dense: bool = False, nblocks: int = 2,
                      noop: bool = False, exact: bool = False,
                      fuse: bool = False, pair: bool = False,
                      panch: bool = False):
    """Wide-layout kernel: po and d in SEPARATE (rows, 128) planes.

    The narrow layout's (sub, 64) compare/select/add values pad their
    64-lane minor dim to 128 in vregs — half of every vector op wasted.
    Full-lane rows also cover 2x bytes each, so the fine window needs
    16 rows instead of 24 (_wfrows vs _frows at sub=128). `dyn` replaces
    the static window with a fori_loop over 8-row groups whose trip
    count comes from the actual row span of the subtile's landing bytes
    (typical photo content: ~2 B/px => 2 rows vs the worst-case-sized
    static window); the alignment slack and worst-case span are paid
    only by content that needs them.

    `exact` drops the 8-row sublane-alignment slack entirely: HALF of
    the static window's frows=16 rows (at sub=128) exist only because
    Mosaic dynamic sublane slices must start 8-aligned, yet the real
    landing span is _wspan_sub(128) = 8 rows starting at row cb-2. A
    16-row 8-aligned slice rotated by `pltpu.roll` (traced shift)
    re-bases the window at exactly cb-2, so the accumulate runs only
    the span rows — half the compare/select/add volume of the r3
    production window, at the price of two sublane rotates per subtile.

    `fuse` folds the driver's global `jnp.cumsum(landed) + seed` into
    the kernel: TPU grid steps execute sequentially (batch-outermost
    under vmap), so an SMEM carry initialized to the seed at t == 0
    plus a log2(sub)-step Hillis-Steele lane prefix per subtile row
    emits the final pixel plane directly. NEGATIVE RESULT (r4,
    PERF_NOTES "Fused in-kernel cumsum"): the scalar carry chains
    every subtile to its predecessor and collapses Mosaic's grid-step
    pipelining — 47.4 vs 236.2 Mpx/s in-context. Kept as a tested
    correctness path and a measured warning against threading scalar
    dependencies through pipelined grid steps.
    """
    if nblocks == 2:
        blk = _wbrows_dense(tile) if dense else _wbrows(tile)
    else:
        assert not dense, "multi-block geometry is byte-granular only"
        blk = _wblk(tile, nblocks)
    wrows = nblocks * blk
    frows = _wfrows_dense(sub) if dense else _wfrows(sub)
    nsub = tile // sub
    ngmax = wrows // 8
    span = (-(-sub // _WROW) + 2) if dense else _wspan_sub(sub)
    lwin = -(-(span + 7) // 8) * 8  # rotate window: span + max offset 7
    assert lwin <= wrows

    assert not (panch and (dyn or fuse or noop)), \
        "prefetched anchors serve the plain exact path only"

    def kernel(qb_ref, *refs):
        if panch:
            r0p_ref, *refs = refs        # packed per-subtile window rows
        if fuse:
            seed_ref, *refs = refs       # second scalar-prefetch operand
        if pair:
            # paired layout (r5): po and d rows of each DMA block ride
            # in ONE (2*blk, 128) block — half the DMA issues per grid
            # step (the per-step overhead, not bandwidth, is the cost)
            pair_refs = refs[:nblocks]
            rest = refs[nblocks:]
        else:
            po_refs = refs[:nblocks]
            d_refs = refs[nblocks:2 * nblocks]
            rest = refs[2 * nblocks:]
        if fuse:
            out_ref, wpo, wd, carry = rest
        else:
            out_ref, wpo, wd = rest
        t = pl.program_id(0)
        if fuse:
            # batch axis (vmap) is OUTSIDE the tile axis, so every
            # stream's first tile re-seeds the carry
            @pl.when(t == 0)
            def _():
                carry[0] = seed_ref[0]
        base_t = t * tile
        for j in range(nblocks):
            if pair:
                wpo[j * blk:(j + 1) * blk, :] = pair_refs[j][0:blk, :]
                wd[j * blk:(j + 1) * blk, :] = pair_refs[j][blk:2 * blk, :]
            else:
                wpo[j * blk:(j + 1) * blk, :] = po_refs[j][...]
                wd[j * blk:(j + 1) * blk, :] = d_refs[j][...]
        if not panch:
            rowfirst = wpo[:, 0:1]                   # (wrows, 1) nondecr.

            bases = base_t + sub * jax.lax.broadcasted_iota(
                jnp.int32, (1, nsub), 1)
            cnt_b = jnp.sum((rowfirst <= bases).astype(jnp.int32),
                            axis=0, keepdims=True)   # (1, nsub)
            if dyn:
                cnt_e = jnp.sum(
                    (rowfirst <= bases + (sub - 1)).astype(jnp.int32),
                    axis=0, keepdims=True)           # (1, nsub)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, nsub), 1)

        # (r5 closed NEGATIVE results, both adaptive-span forms: the
        # per-SUBTILE fori tail cost +4.2 ms/frame (64.8k scalar loop
        # entries), and the per-TILE pl.when branch pair (short 4-row vs
        # full 8-row subtile loops, one scalar branch per grid step)
        # cost +2.0 ms/frame on photo — control flow around the subtile
        # bodies breaks Mosaic's grid-step pipelining, the same failure
        # mode as the fused-cumsum carry (accum="xwf"). The static
        # worst-case span stays.)
        for s in range(nsub):
            base_s = base_t + s * sub
            p_col = base_s + jax.lax.broadcasted_iota(
                jnp.int32, (sub, 1), 0)
            if panch:
                # packed 4x8-bit prefetched window row: word/shift are
                # static per s (nsub % 4 == 0), only t is traced
                word = r0p_ref[t * (nsub // 4) + s // 4]
                r_lo = (word >> (8 * (s % 4))) & 0xFF
                g8 = jnp.clip(r_lo >> 3, 0, (wrows - lwin) // 8) * 8
                o = r_lo - g8                 # in [0, lwin - span]
                sh = (lwin - o) % lwin        # nonneg spelling of -o
                fpo = pltpu.roll(wpo[pl.ds(g8, lwin), :], sh, 0)
                fd = pltpu.roll(wd[pl.ds(g8, lwin), :], sh, 0)
                acc = jnp.zeros((sub, _WROW), jnp.int32)
                for r in range(span):
                    acc = acc + jnp.where(fpo[r:r + 1, :] == p_col,
                                          fd[r:r + 1, :], 0)
                out_ref[s, :] = jnp.sum(acc, axis=1)
                continue
            cb = jnp.sum(jnp.where(lane == s, cnt_b, 0))

            if noop:
                # ABLATION ONLY (wrong results): grid + DMA + anchors +
                # window slice, accumulate dropped — bounds the
                # accumulate's share of the kernel in-context
                row0 = jnp.clip((cb - 2) >> 3,
                                0, (wrows - frows) // 8) * 8
                out_ref[s, :] = jnp.sum(
                    wpo[pl.ds(row0, 8), 0:sub]
                    + wd[pl.ds(row0, 8), 0:sub], axis=0)
                continue
            if exact:
                # exact window: re-base a 16-row (lwin) 8-aligned slice
                # at row cb-2 via a traced-shift sublane rotate; only
                # the real `span` rows enter the accumulate. Wrap rows
                # (rotated in from [0, o)) are span rows [lwin-o, lwin),
                # never read.
                r_lo = jnp.clip(cb - 2, 0, wrows - span)
                g8 = jnp.clip(r_lo >> 3, 0, (wrows - lwin) // 8) * 8
                o = r_lo - g8                     # in [0, lwin - span]
                sh = (lwin - o) % lwin            # nonneg spelling of -o
                fpo = pltpu.roll(wpo[pl.ds(g8, lwin), :], sh, 0)
                fd = pltpu.roll(wd[pl.ds(g8, lwin), :], sh, 0)
                # (r5 closed negative result: a data-adaptive span —
                # 4 static rows + fori tail sized ce - r_lo, one-hot row
                # extraction — regressed 35.1 -> 39.3 ms/frame in-context
                # despite ~74% of subtiles landing in <= 4 rows: the
                # per-subtile scalar loop entry costs more than the 4
                # skipped row accumulates. Static worst-case span stays.)
                acc = jnp.zeros((sub, _WROW), jnp.int32)
                for r in range(span):
                    acc = acc + jnp.where(fpo[r:r + 1, :] == p_col,
                                          fd[r:r + 1, :], 0)
            elif not dyn:
                row0 = jnp.clip((cb - 2) >> 3,
                                0, (wrows - frows) // 8) * 8
                fpo = wpo[pl.ds(row0, frows), :]
                fd = wd[pl.ds(row0, frows), :]
                acc = jnp.zeros((sub, _WROW), jnp.int32)
                for r in range(frows):
                    acc = acc + jnp.where(fpo[r:r + 1, :] == p_col,
                                          fd[r:r + 1, :], 0)
            else:
                ce = jnp.sum(jnp.where(lane == s, cnt_e, 0))
                g0 = jnp.clip((cb - 2) >> 3, 0, ngmax - 1)
                # rows needed: [cb - 2, ce - 1] (rows whose first offset
                # is past the subtile end contribute nothing; rows two
                # below the base count cannot reach the base)
                ng = jnp.clip((ce - g0 * 8 + 7) >> 3, 1, ngmax - g0)

                def body(g, acc):
                    r8 = jnp.clip(g0 + g, 0, ngmax - 1)
                    bpo = wpo[pl.ds(r8 * 8, 8), :]
                    bd = wd[pl.ds(r8 * 8, 8), :]
                    for r in range(8):
                        acc = acc + jnp.where(bpo[r:r + 1, :] == p_col,
                                              bd[r:r + 1, :], 0)
                    return acc

                acc = jax.lax.fori_loop(
                    0, ng, body, jnp.zeros((sub, _WROW), jnp.int32))

            y = jnp.sum(acc, axis=1)                  # (sub,) landed
            if not fuse:
                out_ref[s, :] = y
                continue
            # in-lane inclusive prefix (Hillis-Steele): roll(c, k)[i] =
            # c[i - k mod sub]; lanes i < k receive wrapped values and
            # are masked off. All adds wrap mod 2^32 (associative), so
            # the fused prefix is bit-exact vs the XLA cumsum.
            c = y.reshape(1, sub)
            li = jax.lax.broadcasted_iota(jnp.int32, (1, sub), 1)
            k = 1
            while k < sub:
                c = c + jnp.where(li >= k, pltpu.roll(c, k, 1), 0)
                k <<= 1
            base = carry[0]
            out_ref[s, :] = c[0] + base
            carry[0] = base + jnp.sum(jnp.where(li == sub - 1, c, 0))

    return kernel


def _expand_px_wide(pix_off, px32, n_px_cap: int, interpret: bool,
                    tile: int, sub: int, seed32, dyn: bool,
                    dense: bool = False, nblocks: int = 2,
                    noop: bool = False, exact: bool = False,
                    fuse: bool = False, pair: bool = False,
                    panch: bool = False):
    """Wide-layout driver for expand_px (accum in {"wide", "dyn", "xw"})."""
    if nblocks == 2:
        blk = _wbrows_dense(tile) if dense else _wbrows(tile)
    else:
        assert not dense, "multi-block geometry is byte-granular only"
        blk = _wblk(tile, nblocks)
    frows = _wfrows_dense(sub) if dense else _wfrows(sub)
    assert tile % sub == 0 and frows <= nblocks * blk
    assert tile // sub % 8 == 0 and sub % 128 == 0, "out needs 8k x 128k"
    m = pix_off.shape[0]
    t_out = -(-n_px_cap // tile)
    nfull = -(-m // (_WROW * blk)) + nblocks  # slack: qb + nblocks - 1 in range
    rows_pad = nfull * blk

    seed = (jnp.int32(_SEED32) if seed32 is None
            else jnp.asarray(seed32).view(jnp.int32).reshape(()))
    px_i = px32.view(jnp.int32)
    prev = jnp.concatenate([seed[None], px_i[:-1]])
    d = px_i - prev

    def pad_to(x, n, fill):
        return jnp.concatenate([x, jnp.full((n - x.shape[0],), fill, x.dtype)])

    po_p = pad_to(pix_off.astype(jnp.int32), rows_pad * _WROW, _INF)
    d_p = pad_to(d, rows_pad * _WROW, 0)
    po_r = po_p.reshape(rows_pad, _WROW)
    d_r = d_p.reshape(rows_pad, _WROW)

    rowfirst = po_r[:, 0]
    qs = jnp.arange(t_out, dtype=jnp.int32) * tile
    bshift = blk.bit_length() - 1
    r0 = jnp.searchsorted(rowfirst, qs, method="sort").astype(jnp.int32)
    qb = jnp.maximum(r0 - 1, 0) >> bshift

    panch = panch and exact and not (dyn or fuse or noop)
    nsub = tile // sub
    if panch:
        assert nsub % 4 == 0
        # per-subtile window rows, packed 4x8-bit (r_lo <= wrows - span
        # = 24 < 256): one searchsorted over the SAME row-first offsets
        # the kernel compared in-register, relative to each tile's
        # scratch window
        bases_all = jnp.arange(t_out * nsub, dtype=jnp.int32) * sub
        cb_abs = jnp.searchsorted(rowfirst, bases_all, side="right",
                                  method="sort").astype(jnp.int32)
        wrows = nblocks * blk
        span_k = (-(-sub // _WROW) + 2) if dense else _wspan_sub(sub)
        assert wrows - span_k <= 255, "packed 8-bit anchors cap wrows"
        cb_rel = jnp.clip(cb_abs - jnp.repeat(qb, nsub) * blk, 0, wrows)
        r_lo = jnp.clip(cb_rel - 2, 0, wrows - span_k)
        r4 = r_lo.reshape(-1, 4)
        r0p = (r4[:, 0] | r4[:, 1] << 8 | r4[:, 2] << 16 | r4[:, 3] << 24)

    brows_spec = 2 * blk if pair else blk
    if fuse:
        def mk_spec(j):
            return pl.BlockSpec((brows_spec, _WROW),
                                lambda t, q, sd, j=j: (q[t] + j, 0))
        out_spec = pl.BlockSpec((tile // sub, sub), lambda t, q, sd: (t, 0))
        n_pref, pref = 2, (qb, seed[None])
    elif panch:
        def mk_spec(j):
            return pl.BlockSpec((brows_spec, _WROW),
                                lambda t, q, rp, j=j: (q[t] + j, 0))
        out_spec = pl.BlockSpec((tile // sub, sub), lambda t, q, rp: (t, 0))
        n_pref, pref = 2, (qb, r0p)
    else:
        def mk_spec(j):
            return pl.BlockSpec((brows_spec, _WROW),
                                lambda t, q, j=j: (q[t] + j, 0))
        out_spec = pl.BlockSpec((tile // sub, sub), lambda t, q: (t, 0))
        n_pref, pref = 1, (qb,)

    if pair:
        # paired operand: [poB_k; dB_k] alternating per blk-row block —
        # one (2*blk, 128) DMA block carries both planes of a window
        # block, halving per-step DMA issues
        inter = jnp.stack([po_r.reshape(nfull, blk, _WROW),
                           d_r.reshape(nfull, blk, _WROW)],
                          axis=1).reshape(2 * rows_pad, _WROW)
        operands = [inter] * nblocks
    else:
        operands = [po_r] * nblocks + [d_r] * nblocks

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_pref,
        grid=(t_out,),
        in_specs=[mk_spec(j) for j in range(nblocks)] * (1 if pair else 2),
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((nblocks * blk, _WROW), jnp.int32),
                        pltpu.VMEM((nblocks * blk, _WROW), jnp.int32)]
        + ([pltpu.SMEM((1,), jnp.int32)] if fuse else []),
    )
    landed = pl.pallas_call(
        _make_wide_kernel(tile, sub, dyn, dense, nblocks, noop, exact,
                          fuse, pair, panch),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (t_out * (tile // sub), sub), jnp.int32),
        interpret=interpret,
    )(*pref, *operands)
    landed = landed.reshape(-1)[:n_px_cap]
    if fuse:  # kernel already emitted prefix sums + seed
        return landed.view(jnp.uint32)
    # plain XLA cumsum: in-context A/B (r4) says the blocked form is
    # ~0.5 ms/frame WORSE here under vmap, while the encode-side scans
    # want blocked — this one site stays on jnp.cumsum
    return (jnp.cumsum(landed) + seed).view(jnp.uint32)


#: paired po|d DMA blocks (r5 experiment): ONE (2*blk, 128) block per
#: window block instead of separate po and d blocks — halves per-step
#: DMA issues. abperf flips this ("b16 pair" decode entry).
_PAIR_DMA = False

#: prefetched per-subtile window anchors (r5): the exact-path kernel
#: used to derive each subtile's window row from a broadcast compare +
#: a narrow per-subtile reduction (~64.8k scalar extractions/frame —
#: measured 4.2 ms/frame!); r_lo for EVERY subtile is now precomputed
#: XLA-side (one searchsorted over row-first offsets) and shipped as a
#: packed 4x8-bit scalar-prefetch table (t_out*nsub/4 words, SMEM) the
#: kernel reads at ~2 cycles. Hardware b16 photo: 31.0 vs 35.2
#: ms/frame — PRODUCTION DEFAULT. abperf sweeps it ("b16 panch").
_PREF_ANCHORS = True


@functools.partial(jax.jit, static_argnames=(
    "n_px_cap", "interpret", "tile", "sub", "accum", "dense", "nblocks",
    "pair", "panch"))
def expand_px(pix_off, px32, n_px_cap: int, interpret: bool = False,
              tile: int = _TILE, sub: int = _SUB, seed32=None,
              accum: str = "xw", dense: bool = False, nblocks: int = 2,
              pair: bool | None = None, panch: bool | None = None):
    """Per-pixel packed-u32 plane from per-byte decode results.

    pix_off: (M,) i32 nondecreasing pixel offset of the chunk at/after
    each byte (the exclusive-cumsum-of-npix convention: tail bytes carry
    the next chunk's offset); px32: (M,) u32 value after each byte
    (changes only at chunk starts). Pixels past the last chunk repeat
    its value; pixels before any chunk get the seed (truncation
    tolerance, reference qoi.h:544). Returns (n_px_cap,) u32.
    """
    if accum in ("wide", "dyn", "wnoop", "xw", "xwf"):
        return _expand_px_wide(pix_off, px32, n_px_cap, interpret,
                               tile, sub, seed32, dyn=accum == "dyn",
                               dense=dense, nblocks=nblocks,
                               noop=accum == "wnoop",
                               exact=accum in ("xw", "xwf"),
                               fuse=accum == "xwf",
                               pair=_PAIR_DMA if pair is None else pair,
                               panch=(_PREF_ANCHORS if panch is None
                                      else panch))
    assert not dense, "dense geometry is wide-layout only"
    brows = _brows(tile)  # block pair covers the tile's landing bytes
    assert tile % sub == 0 and _frows(sub) <= 2 * brows
    # lane-major output blocks: one row per subtile, Mosaic requires the
    # block's last-two dims divisible by (8, 128)
    assert tile // sub % 8 == 0 and sub % 128 == 0, "out needs 8k x 128k"
    m = pix_off.shape[0]
    t_out = -(-n_px_cap // tile)
    nblocks = -(-m // (_ROW * brows)) + 2  # slack: qb + 1 always in range
    rows_pad = nblocks * brows

    seed = (jnp.int32(_SEED32) if seed32 is None
            else jnp.asarray(seed32).view(jnp.int32).reshape(()))
    px_i = px32.view(jnp.int32)
    prev = jnp.concatenate([seed[None], px_i[:-1]])
    d = px_i - prev

    def pad_to(x, n, fill):
        return jnp.concatenate([x, jnp.full((n - x.shape[0],), fill, x.dtype)])

    po_p = pad_to(pix_off.astype(jnp.int32), rows_pad * _ROW, _INF)
    d_p = pad_to(d, rows_pad * _ROW, 0)

    recs = jnp.concatenate([
        po_p.reshape(rows_pad, _ROW),
        d_p.reshape(rows_pad, _ROW),
    ], axis=1)

    # block anchor per tile, from ROW-first offsets (64x fewer elements
    # than po_p) with the sort-method searchsorted: the default 'scan'
    # method is a ~24-step gather loop, and gathers cost ~10 ms/M on
    # this platform (PERF_NOTES) — under vmap it was a visible slice of
    # the batched decode. Anchoring at the row before the first row
    # whose first offset >= the tile base keeps the first landing byte's
    # row in the pair; the landing span (< brows rows) then fits because
    # that row sits within the pair's first brows+1 rows.
    rowfirst = po_p.reshape(rows_pad, _ROW)[:, 0]
    qs = jnp.arange(t_out, dtype=jnp.int32) * tile
    bshift = brows.bit_length() - 1           # brows is a power of two
    r0 = jnp.searchsorted(rowfirst, qs, method="sort").astype(jnp.int32)
    qb = jnp.maximum(r0 - 1, 0) >> bshift

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_out,),
        in_specs=[
            pl.BlockSpec((brows, _RLANES), lambda t, q: (q[t], 0)),
            pl.BlockSpec((brows, _RLANES), lambda t, q: (q[t] + 1, 0)),
        ],
        out_specs=pl.BlockSpec((tile // sub, sub), lambda t, q: (t, 0)),
        scratch_shapes=[pltpu.VMEM((2 * brows, _RLANES), jnp.int32)],
    )
    landed = pl.pallas_call(
        _make_kernel(tile, sub, accum),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (t_out * (tile // sub), sub), jnp.int32),
        interpret=interpret,
    )(qb, recs, recs)
    # rows are (tile, subtile) in order, lanes are pixels: row-major
    # flatten IS pixel order
    landed = landed.reshape(-1)[:n_px_cap]
    # plain XLA cumsum: in-context A/B (r4) says the blocked form is
    # ~0.5 ms/frame WORSE here under vmap, while the encode-side scans
    # want blocked — this one site stays on jnp.cumsum
    return (jnp.cumsum(landed) + seed).view(jnp.uint32)


def expand_px_xla(pix_off, px32, n_px_cap: int, seed32=None):
    """XLA reference path (one scatter-add + cumsum via the same
    telescoping identity) — fallback on non-TPU platforms and the
    differential oracle for the kernel tests."""
    seed = (jnp.int32(_SEED32) if seed32 is None
            else jnp.asarray(seed32).view(jnp.int32).reshape(()))
    px_i = px32.view(jnp.int32)
    prev = jnp.concatenate([seed[None], px_i[:-1]])
    d = px_i - prev
    plane = jnp.zeros((n_px_cap,), jnp.int32).at[
        pix_off.astype(jnp.int32)].add(d, mode="drop", indices_are_sorted=True)
    return (jnp.cumsum(plane) + seed).view(jnp.uint32)
