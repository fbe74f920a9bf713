"""Scan-shaped primitives: run segmentation and prefix sums.

These break the `run` loop-carry of the reference encoder (qoi.h:415-428)
into data-parallel form (SURVEY.md §7.2 stage 1): run membership is a
cumulative-max over "last non-equal pixel index", and all RUN-chunk emission
points follow from positions within a run modulo the 62-cap.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import format as fmt


def exclusive_cumsum(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    inc = jnp.cumsum(x, axis=axis)
    return inc - x


def last_true_index(mask: jnp.ndarray) -> jnp.ndarray:
    """For each i (last axis), the largest j <= i with mask[j], else -1."""
    n = mask.shape[-1]
    io = jnp.arange(n, dtype=jnp.int32)
    io = jnp.broadcast_to(io, mask.shape)
    return jax.lax.cummax(jnp.where(mask, io, -1), axis=mask.ndim - 1)


class RunInfo(NamedTuple):
    """Per-pixel run bookkeeping. All arrays share the input's shape."""

    emits_run: jnp.ndarray   # bool: this eq-pixel emits a RUN chunk here
    run_val: jnp.ndarray     # int32: RUN length emitted (valid iff emits_run)
    flush: jnp.ndarray       # bool: literal pixel preceded by a pending run
    flush_val: jnp.ndarray   # int32: pending run length (valid iff flush)


def run_segmentation(eq: jnp.ndarray, last_pos=None, run_in=None) -> RunInfo:
    """Resolve every RUN-chunk emission point from the equality mask.

    eq[i] means pixel i equals pixel i-1 (pixel -1 being the seed, or the
    incoming boundary pixel in tiled strict mode). The reference emits a RUN
    when the accumulator hits 62 or at the last pixel (qoi.h:417), and
    flushes a pending run before any literal (qoi.h:425-428). run position =
    distance to the last non-eq pixel; since a run resets at every 62nd
    member, emission points are run positions ≡ 0 (mod 62).

    `last_pos` overrides the index of the stream's final pixel (default
    n-1; pass -1 for "not in this tile"), for shape-bucketed buffers whose
    logical length is a traced scalar and for non-final tiles.

    `run_in` (traced int32 in [0, 61], broadcastable over batch dims) is the
    pending not-yet-emitted run length entering this tile (SURVEY §7.2
    stage 5: the 62-flush phase must carry across tile boundaries). The
    leading all-eq prefix continues that run, and a leading literal flushes
    it.
    """
    n = eq.shape[-1]
    io = jnp.arange(n, dtype=jnp.int32)
    io = jnp.broadcast_to(io, eq.shape)
    # for a prefix that is all-eq (pixels equal to the seed), last_noneq = -1
    # and run_pos = i + 1: the seed run starts at pixel 0 (SURVEY §2.2 note)
    last_noneq = last_true_index(~eq)
    run_pos = io - last_noneq
    if run_in is None:
        run_in = jnp.int32(0)
    else:
        run_in = jnp.asarray(run_in, jnp.int32)
    # the leading run continues the incoming pending run
    run_pos = run_pos + jnp.where(last_noneq == -1, run_in[..., None], 0)

    is_last = io == (jnp.asarray(n - 1 if last_pos is None else last_pos)[..., None])
    emits_run = eq & ((run_pos % fmt.RUN_CAP == 0) | is_last)
    run_val = (run_pos - 1) % fmt.RUN_CAP + 1

    prev_eq = jnp.roll(eq, 1, axis=-1).at[..., 0].set(run_in > 0)
    prev_run_pos = jnp.roll(run_pos, 1, axis=-1).at[..., 0].set(run_in)
    flush = (~eq) & prev_eq & (prev_run_pos % fmt.RUN_CAP != 0)
    flush_val = (prev_run_pos - 1) % fmt.RUN_CAP + 1
    return RunInfo(emits_run, run_val, flush, flush_val)
