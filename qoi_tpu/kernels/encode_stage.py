"""Fused Pallas encode-staging kernel: stages 1-4 in ONE pass over HBM.

The XLA formulation of the encoder's per-pixel stages (models/pipeline.py)
materializes ~a dozen N-sized intermediates (eq, run positions, one-hot
writer tables, classification planes, ...) — each an HBM round trip. This
kernel computes per-pixel staging bytes + lengths in a single sweep:
~4 B/px read, ~7 B/px written, everything else VMEM-resident.

The grid is sequential on TPU, so the four encoder carries (qoi.h:406-478)
ride in scratch across blocks — the same EncoderCarry contract as the
tiled/streamed paths:

  prev pixel — last row of the previous block
  run phase  — scalar in SMEM
  table      — (64,) packed values + written mask in VMEM, updated by a
               log-depth overwrite-doubling scan per block

All within-block scans (last-non-eq cummax, last-writer overwrite) are
log2(B) roll+select doubling passes on VMEM blocks — no gathers, no
scatters, no cross-block HBM traffic.

Status (round 2): compiles and runs BIT-EXACT on real TPU v5e at
block=1024 after removing a redundant has-entry reduction that crashed
Mosaic (see the `hit` comment below). Measured 145 ms vs 56 ms for the
XLA stages at 4K on this platform: the sequential grid (8.1k steps
carrying encoder state) pays ~5 us/step of grid overhead and the
narrow (B, 4)/(B, 6)/(B, 1) block shapes lane-pad; block >= 2048 still
crashes the remote Mosaic helper. The XLA formulation therefore stays
the production path; this kernel is the hardware-validated fused
alternative and the template for a future lane-major restructuring
(PERF_NOTES.md round-2 notes).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import format as fmt

_BLOCK = 1024
_SLOTS = 64
_HM = fmt.HASH_MULTIPLIERS


def _shift_down(x, s, fill):
    """x[i] <- x[i-s] along axis 0, first s rows <- fill. Static s.
    Static slices + concatenate only (jnp.roll lowers to dynamic_slice,
    which Mosaic does not support)."""
    fill = jnp.broadcast_to(fill, x.shape)
    if s >= x.shape[0]:
        return fill
    return jnp.concatenate([fill[:s], x[:-s]], axis=0)


def _cummax_rows(x):
    """Inclusive cummax along axis 0 by doubling (log2(B) passes)."""
    n = x.shape[0]
    s = 1
    while s < n:
        x = jnp.maximum(x, _shift_down(x, s, jnp.full_like(x, -(2 ** 30))))
        s <<= 1
    return x


def _overwrite_scan_rows(val, wr):
    """Inclusive last-writer-wins scan along axis 0: per column, the value
    of the latest row with wr != 0. Masks are int32 0/1 — boolean
    concat/select at this shape crashes the Mosaic compiler."""
    n = val.shape[0]
    s = 1
    while s < n:
        up_v = _shift_down(val, s, jnp.zeros_like(val))
        up_w = _shift_down(wr, s, jnp.zeros_like(wr))
        val = jnp.where(wr != 0, val, up_v)
        wr = wr | up_w
        s <<= 1
    return val, wr


def _kernel(nv_ref, last_ref, px_ref, stag_ref, len_ref,
            prev_s, run_s, tblv_s, tblw_s):
    b = px_ref.shape[0]
    blk = pl.program_id(0)
    base = blk * b
    n_valid = nv_ref[0]
    last_pos = last_ref[0]  # global index of the stream's final pixel (or -1)

    @pl.when(blk == 0)
    def _():
        prev_s[0, 0] = 0
        prev_s[0, 1] = 0
        prev_s[0, 2] = 0
        prev_s[0, 3] = 255
        run_s[0] = 0
        tblv_s[:] = jnp.zeros_like(tblv_s)
        tblw_s[:] = jnp.zeros_like(tblw_s)

    px = px_ref[:].astype(jnp.int32)  # (B, 4)
    row = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)[:, 0]
    gid = base + row
    valid = gid < n_valid

    # traced scalars may only enter vectors via jnp.full on this Mosaic
    # version (jnp.array-of-scalars / scalar-where broadcasts crash the
    # remote compiler)
    carry_prev = jnp.concatenate(
        [jnp.full((1, 1), prev_s[0, c], jnp.int32) for c in range(4)], axis=1)
    prev = _shift_down(px, 1, jnp.broadcast_to(carry_prev, px.shape))
    eq = jnp.all(px == prev, axis=-1) | ~valid  # (B,)

    run_in = run_s[0]

    # -- run segmentation (qoi.h:415-428), within-block + carry
    ln = _cummax_rows(jnp.where(~eq, row, -1)[:, None])[:, 0]  # last non-eq
    run_pos = jnp.where(ln < 0, row + 1 + run_in, row - ln)
    is_last = gid == last_pos
    emits_run = eq & ((run_pos % fmt.RUN_CAP == 0) | is_last) & valid
    run_val = (run_pos - 1) % fmt.RUN_CAP + 1
    prev_eq = _shift_down(eq.astype(jnp.int32)[:, None], 1,
                          jnp.full((b, 1), (run_in > 0).astype(jnp.int32))
                          )[:, 0] != 0
    prev_run_pos = _shift_down(run_pos[:, None], 1, jnp.full((b, 1), run_in))[:, 0]
    flush = (~eq) & prev_eq & (prev_run_pos % fmt.RUN_CAP != 0)
    flush_val = (prev_run_pos - 1) % fmt.RUN_CAP + 1

    # -- color-table replay (qoi.h:430-436), overwrite-doubling + carry
    key = (px[:, 0] * _HM[0] + px[:, 1] * _HM[1]
           + px[:, 2] * _HM[2] + px[:, 3] * _HM[3]) & (_SLOTS - 1)
    # packed pixel kept as int32: Mosaic lacks unsigned reductions
    packed = px[:, 0] | px[:, 1] << 8 | px[:, 2] << 16 | px[:, 3] << 24
    slots = jax.lax.broadcasted_iota(jnp.int32, (b, _SLOTS), 1)
    onehot = ((key[:, None] == slots) & ~eq[:, None]).astype(jnp.int32)
    wv = jnp.where(onehot != 0, packed[:, None], 0)
    scan_v, scan_w = _overwrite_scan_rows(wv, onehot)
    # exclusive: shift down one row, then merge the incoming carry table
    ex_v = _shift_down(scan_v, 1, jnp.zeros_like(scan_v))
    ex_w = _shift_down(scan_w, 1, jnp.zeros_like(scan_w))
    carry_v = tblv_s[0][None, :]
    carry_w = tblw_s[0][None, :]
    eff_v = jnp.where(ex_w != 0, ex_v, jnp.broadcast_to(carry_v, ex_v.shape))
    eff_w = (ex_w != 0) | (jnp.broadcast_to(carry_w, ex_w.shape) != 0)
    sel = key[:, None] == slots
    before = jnp.sum(jnp.where(sel & eff_w, eff_v, 0), axis=1)
    # no separate has-entry reduction (a second masked sum over the slot
    # axis crashes the Mosaic compiler when combined with the classifier
    # select chain): an unwritten slot sums to packed 0, and packed 0 IS
    # the zero pixel (0,0,0,0) the reference's zeroed table would match,
    # so `before == packed` alone is bit-exact
    hit = ~eq & (before == packed)

    # -- classification (qoi.h:438-474), int8 wraparound via mod-256
    d = (px[:, :3] - prev[:, :3]) & 0xFF
    sgn = lambda v: v - jnp.where(v > 127, 256, 0)  # to signed char
    vr, vg, vb = sgn(d[:, 0]), sgn(d[:, 1]), sgn(d[:, 2])
    vg_r = sgn((vr - vg) & 0xFF)
    vg_b = sgn((vb - vg) & 0xFF)
    alpha_same = px[:, 3] == prev[:, 3]
    small = lambda v: (v >= -2) & (v <= 1)
    is_diff = alpha_same & small(vr) & small(vg) & small(vb)
    is_luma = (alpha_same & ~is_diff
               & (vg >= -32) & (vg <= 31)
               & (vg_r >= -8) & (vg_r <= 7)
               & (vg_b >= -8) & (vg_b <= 7))
    is_rgb = alpha_same & ~is_diff & ~is_luma

    diff_b0 = fmt.OP_DIFF | (vr + 2) << 4 | (vg + 2) << 2 | (vb + 2)
    luma_b0 = fmt.OP_LUMA | (vg + 32)
    luma_b1 = (vg_r + 8) << 4 | (vg_b + 8)

    own0 = jnp.where(hit, fmt.OP_INDEX | key,
           jnp.where(is_diff, diff_b0,
           jnp.where(is_luma, luma_b0,
           jnp.where(is_rgb, fmt.OP_RGB, fmt.OP_RGBA))))
    own1 = jnp.where(is_luma, luma_b1, px[:, 0])
    own2 = px[:, 1]
    own3 = px[:, 2]
    own4 = px[:, 3]
    own_len = jnp.where(hit, 1,
              jnp.where(is_diff, 1,
              jnp.where(is_luma, 2,
              jnp.where(is_rgb, 4, 5))))

    run_byte = fmt.OP_RUN | (run_val - 1)
    flush_byte = fmt.OP_RUN | (flush_val - 1)

    s0 = jnp.where(eq, run_byte, jnp.where(flush, flush_byte, own0))
    s1 = jnp.where(eq, 0, jnp.where(flush, own0, own1))
    s2 = jnp.where(eq, 0, jnp.where(flush, own1, own2))
    s3 = jnp.where(eq, 0, jnp.where(flush, own2, own3))
    s4 = jnp.where(eq, 0, jnp.where(flush, own3, own4))
    s5 = jnp.where(eq | ~flush, 0, own4)
    lens = jnp.where(eq, jnp.where(emits_run, 1, 0),
                     own_len + flush.astype(jnp.int32))
    # zero staged bytes beyond each length so downstream OR/merge is clean
    col = jax.lax.broadcasted_iota(jnp.int32, (b, 6), 1)
    stag = jnp.stack([s0, s1, s2, s3, s4, s5], axis=1)
    stag_ref[:] = jnp.where(col < lens[:, None], stag, 0).astype(jnp.uint8)
    len_ref[:] = lens.astype(jnp.int32)[:, None]

    # -- carry updates
    nv_loc = jnp.clip(n_valid - base, 0, b)
    last_row = jnp.maximum(nv_loc - 1, 0)
    lastpx = jnp.sum(jnp.where(row[:, None] == last_row, px, 0), axis=0)
    keep = nv_loc == 0
    prev_s[0, 0] = jnp.where(keep, prev_s[0, 0], lastpx[0])
    prev_s[0, 1] = jnp.where(keep, prev_s[0, 1], lastpx[1])
    prev_s[0, 2] = jnp.where(keep, prev_s[0, 2], lastpx[2])
    prev_s[0, 3] = jnp.where(keep, prev_s[0, 3], lastpx[3])
    ln_last = jnp.max(jnp.where(~eq, row, -1))
    trail = jnp.where(ln_last < 0, nv_loc + run_in, (nv_loc - 1) - ln_last)
    run_s[0] = jnp.where(last_pos < base + nv_loc, 0,
                         trail % fmt.RUN_CAP).astype(jnp.int32)
    # static-slice the last row (bare x[-1] lowers to dynamic_slice here)
    new_v = scan_v[b - 1 : b].reshape(-1)
    new_w = scan_w[b - 1 : b].reshape(-1)
    tblv_s[0, :] = jnp.where(new_w != 0, new_v, carry_v[0])
    tblw_s[0, :] = new_w | carry_w[0]


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def encode_stage_pallas(px4: jnp.ndarray, n_valid, last_pos=None,
                        block: int = _BLOCK, interpret: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused staging: px4 (N, 4) uint8 (N multiple of block) -> (staging
    (N, 6) uint8, lens (N,) int32), matching models/pipeline.py stages 1-4.
    `last_pos` is the stream's final-pixel index (defaults to n_valid-1)."""
    n = px4.shape[0]
    assert n % block == 0, "pad pixel count to a block multiple"
    n_valid = jnp.asarray(n_valid, jnp.int32)
    if last_pos is None:
        last_pos = n_valid - 1
    last_pos = jnp.asarray(last_pos, jnp.int32)

    grid = n // block
    return pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((block, 4), lambda i, *_: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((block, 6), lambda i, *_: (i, 0)),
                pl.BlockSpec((block, 1), lambda i, *_: (i, 0)),
            ],
            scratch_shapes=[
                pltpu.SMEM((1, 4), jnp.int32),   # prev pixel carry
                pltpu.SMEM((1,), jnp.int32),     # pending-run carry
                pltpu.VMEM((1, _SLOTS), jnp.int32),   # table values
                pltpu.VMEM((1, _SLOTS), jnp.int32),   # table written
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n, 6), jnp.uint8),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        interpret=interpret,
    )(n_valid[None], last_pos[None], px4)
