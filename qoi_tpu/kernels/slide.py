"""Pallas VMEM kernel for the word-sum event slide (ops/compact.py).

The XLA slide is log2(sw) full-array passes: every pass reads and
writes both (nseg, sw) planes through HBM (~12 x 260 MB of traffic at
the bench shape, measured ~12 ms/frame in-context). Here each grid step
loads a block of whole segment rows into VMEM, runs ALL passes
in-register, and writes the slid val plane once — HBM sees each plane
exactly once in each direction.

Rows are independent (the slide never crosses a segment row), so the
block is simply (rows, sw) and every pass is a lane-granular static
slice+concat shift along the minor axis — the Mosaic-safe shift
spelling (PERF_NOTES.md: jnp.roll / dynamic slices are not; int32
everywhere — u32 reductions and i1 relayouts are compiler traps, and
this kernel needs neither).

Differentially tested against ops/compact._wordsum_slide (interpret
mode on CPU, hardware via tools/abperf.py's verified encode variants).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

#: segment rows per grid step: amortizes per-step grid/DMA overhead;
#: VMEM footprint = rows * sw * 4 B * 3 (val in/out + aux) ~ 0.8 MB at
#: (8, 8192)
_ROWS = 8

#: scoped-VMEM budget for one grid step's working set. The compiler's
#: stack limit is 16 MB; the observed allocation is ~9.4 buffers of
#: (rows, sw) i32 (in/out double-buffering + shift temporaries):
#: sw=73728 at rows=8 OOM'd at 22.19M while sw=40960 at rows=8 (12.3M)
#: ran (hardware r4). Mosaic needs the row block divisible by 8, so 8
#: is the floor — sw beyond ~49k lanes cannot fit this kernel at all
#: (seg <= ~20480 is the kernel-slide ceiling; the r4 seg sweep peaked
#: there at 362.7 Mpx/s encode).
_VMEM_BUDGET = 15 << 20


def _auto_rows(rows: int, sw: int, planes: int = 1) -> int:
    while rows > 8 and rows * sw * 4 * 10 * planes > _VMEM_BUDGET:
        rows >>= 1
    # rows = 8 is Mosaic's block floor: below it the working set cannot
    # shrink further, and letting the compiler hit its 16 MB scoped-VMEM
    # stack limit yields an opaque remote-helper OOM. Fail loudly with
    # the actionable bound instead (ADVICE r4).
    if rows * sw * 4 * 10 * planes > _VMEM_BUDGET:
        raise ValueError(
            f"slide kernel working set {rows * sw * 4 * 10 * planes} B "
            f"exceeds the {_VMEM_BUDGET} B Mosaic VMEM budget at the "
            f"8-row block floor (sw={sw}, planes={planes}); use a "
            f"smaller segment width (seg <= ~20480) or the XLA slide")
    return rows


def _slide_kernel(val_ref, aux_ref, out_ref, *, sw: int):
    val = val_ref[...].astype(jnp.int32)
    aux = aux_ref[...]
    rows = val.shape[0]

    def shift(x, j):
        return jnp.concatenate(
            [x[:, j:], jnp.zeros((rows, j), x.dtype)], axis=1)

    bit = 1
    while bit < sw:
        val_s = shift(val, bit)
        aux_s = shift(aux, bit)
        dbit = jnp.int32(bit << 1)
        mv_in = ((aux_s & dbit) != 0) & ((aux_s & 1) != 0)
        mv_out = ((aux & dbit) != 0) & ((aux & 1) != 0)
        val = jnp.where(mv_in, val_s, val)
        aux = jnp.where(mv_in, aux_s,
                        jnp.where(mv_out, jnp.int32(0), aux))
        bit <<= 1
    # alive-mask the output: slots not holding a landed event carry
    # stale values otherwise (events land densely at [0, cnt), so this
    # equals the assemble-side `iota < cnt` mask — now done here for
    # free in-register, letting the assemble skip a full-plane pass)
    out_ref[...] = jnp.where((aux & 1) != 0, val, 0)


def _slide_kernel2(val_ref, val2_ref, aux_ref, out_ref, out2_ref, *,
                   sw: int):
    """Two-value-plane variant: both planes ride the same aux moves
    (used by the decode-side chunk compaction: pix_off + px planes)."""
    val = val_ref[...].astype(jnp.int32)
    val2 = val2_ref[...].astype(jnp.int32)
    aux = aux_ref[...]
    rows = val.shape[0]

    def shift(x, j):
        return jnp.concatenate(
            [x[:, j:], jnp.zeros((rows, j), x.dtype)], axis=1)

    bit = 1
    while bit < sw:
        val_s = shift(val, bit)
        val2_s = shift(val2, bit)
        aux_s = shift(aux, bit)
        dbit = jnp.int32(bit << 1)
        mv_in = ((aux_s & dbit) != 0) & ((aux_s & 1) != 0)
        mv_out = ((aux & dbit) != 0) & ((aux & 1) != 0)
        val = jnp.where(mv_in, val_s, val)
        val2 = jnp.where(mv_in, val2_s, val2)
        aux = jnp.where(mv_in, aux_s,
                        jnp.where(mv_out, jnp.int32(0), aux))
        bit <<= 1
    alive = (aux & 1) != 0  # see _slide_kernel
    out_ref[...] = jnp.where(alive, val, 0)
    out2_ref[...] = jnp.where(alive, val2, 0)


def slide_val2(val: jnp.ndarray, val2: jnp.ndarray, aux: jnp.ndarray,
               rows: int = _ROWS, interpret: bool = False):
    """Like slide_val but carries TWO value planes through the same
    moves. Returns (val', val2') as int32 planes."""
    nseg, sw = val.shape
    rows = _auto_rows(rows, sw, planes=2)
    npad = -(-nseg // rows) * rows - nseg

    def pad(x):
        if not npad:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((npad, sw), jnp.int32)], axis=0)

    vi, v2, ai = (pad(val.view(jnp.int32)), pad(val2.view(jnp.int32)),
                  pad(aux))
    kern = functools.partial(_slide_kernel2, sw=sw)
    spec = pl.BlockSpec((rows, sw), lambda i: (i, 0))
    out, out2 = pl.pallas_call(
        kern,
        grid=((nseg + npad) // rows,),
        in_specs=[spec, spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((nseg + npad, sw), jnp.int32),
                   jax.ShapeDtypeStruct((nseg + npad, sw), jnp.int32)],
        interpret=interpret,
    )(vi, v2, ai)
    return out[:nseg], out2[:nseg]


def slide_val(val: jnp.ndarray, aux: jnp.ndarray,
              rows: int = _ROWS, interpret: bool = False) -> jnp.ndarray:
    """Slide events to their within-segment positions; returns the slid
    val plane (the aux plane is dead after the slide — the assemble
    masks by per-segment counts). val: (nseg, sw) uint32; aux: (nseg,
    sw) int32 with alive in bit 0 and the distance in bits 1..; both
    exactly as `ops/compact._wordsum_events_words` builds them."""
    nseg, sw = val.shape
    rows = _auto_rows(rows, sw)
    # Mosaic needs the block's second-minor dim divisible by 8: pad with
    # zero rows (dead events — the assemble masks by per-segment counts)
    # and slice back after
    npad = -(-nseg // rows) * rows - nseg
    vi = val.view(jnp.int32)
    ai = aux
    if npad:
        vi = jnp.concatenate(
            [vi, jnp.zeros((npad, sw), jnp.int32)], axis=0)
        ai = jnp.concatenate(
            [ai, jnp.zeros((npad, sw), jnp.int32)], axis=0)
    kern = functools.partial(_slide_kernel, sw=sw)
    out = pl.pallas_call(
        kern,
        grid=((nseg + npad) // rows,),
        in_specs=[
            pl.BlockSpec((rows, sw), lambda i: (i, 0)),
            pl.BlockSpec((rows, sw), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((rows, sw), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nseg + npad, sw), jnp.int32),
        interpret=interpret,
    )(vi, ai)
    return out[:nseg].view(jnp.uint32)
