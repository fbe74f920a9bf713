"""Color-index-table replay as an associative "last-writer-wins" scan.

The key insight (SURVEY.md §2.2 derived property): after any non-run pixel p
the reference table satisfies index[hash(p)] == p, whether the op was a hit
or a miss. So the table state before pixel i at slot s is simply the value of
the *most recent preceding non-run pixel hashing to s* (or the zero entry) —
independent of which ops the encoder chose. That makes the 64-slot table an
overwrite monoid: per-block summaries compose associatively, exactly like
blockwise context-parallel attention state (SURVEY.md §5.7).

Implementation: two vectorized in-block passes around one log-depth scan.
  pass 1: in-block replay from a zero table  -> per-block summary tables
  scan  : exclusive overwrite-scan over block summaries -> incoming tables
  pass 2: in-block replay from the incoming table -> per-pixel lookups
Both passes are a `lax.scan` over the block's *positions*, vectorized across
all blocks — sequential depth B, parallel width N/B * 64 lanes.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .. import format as fmt

_SLOTS = 64


def pack_rgba(px4: jnp.ndarray) -> jnp.ndarray:
    """Pack (..., 4) uint8 into (...,) uint32: r | g<<8 | b<<16 | a<<24.
    Note packed(0,0,0,0) == 0 == the zero-initialised table entry, so the
    zero table needs no special-casing (SURVEY §2.2)."""
    x = px4.astype(jnp.uint32)
    return x[..., 0] | x[..., 1] << 8 | x[..., 2] << 16 | x[..., 3] << 24


def hash64(px4: jnp.ndarray) -> jnp.ndarray:
    """Table slot (reference qoi.h:92-94). px4: (..., 4) uint8 -> int32."""
    mult = jnp.array(fmt.HASH_MULTIPLIERS, dtype=jnp.int32)
    return (px4.astype(jnp.int32) @ mult) & (_SLOTS - 1)


def _replay_block(keys_t, vals_t, write_t, init_table, init_written):
    """Vectorized in-block replay. *_t: (B, nb) position-major arrays;
    init_*: (nb, 64). Returns (before_vals (B, nb), final_table, final_written).
    """

    def step(carry, inp):
        table, written = carry  # (nb, 64) uint32 / bool
        k, v, w = inp           # (nb,) each
        onehot = k[:, None] == jnp.arange(_SLOTS, dtype=jnp.int32)[None, :]
        before = jnp.sum(jnp.where(onehot, table, 0), axis=-1, dtype=jnp.uint32)
        do = onehot & w[:, None]
        table = jnp.where(do, v[:, None], table)
        written = written | do
        return (table, written), before

    (table, written), before = jax.lax.scan(
        step, (init_table, init_written), (keys_t, vals_t, write_t)
    )
    return before, table, written


def table_replay(
    keys: jnp.ndarray,
    vals: jnp.ndarray,
    write: jnp.ndarray,
    block: int = 256,
    incoming: Tuple[jnp.ndarray, jnp.ndarray] | None = None,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Per-position table lookups under last-writer-wins replay.

    Args:
      keys: (N,) int32 slot per position (0..63).
      vals: (N,) uint32 packed pixel per position.
      write: (N,) bool — whether this position writes its slot (non-run pixels
        in the encoder; every chunk in the decoder).
      block: in-block scan depth B (sequential depth of the two passes).
      incoming: optional initial table state (table (64,) uint32,
        written (64,) bool) — e.g. carried across tiles in strict mode.

    Returns:
      before: (N,) uint32 — table value at keys[i] just before position i
        (0 for never-written slots: the zero table).
      (final_table, final_written): (64,) state after all positions, for
        chaining across tiles via collectives (SURVEY §5.7/§7.2 stage 5).
    """
    n = keys.shape[0]
    nb = -(-n // block)
    pad = nb * block - n

    keys_p = jnp.pad(keys, (0, pad))
    vals_p = jnp.pad(vals, (0, pad))
    write_p = jnp.pad(write, (0, pad))  # pads are non-writing

    # position-major (B, nb) so lax.scan slices one position per step
    kt = keys_p.reshape(nb, block).T
    vt = vals_p.reshape(nb, block).T
    wt = write_p.reshape(nb, block).T

    zero_t = jnp.zeros((nb, _SLOTS), jnp.uint32)
    zero_w = jnp.zeros((nb, _SLOTS), bool)

    # pass 1: local summaries from a zero table
    _, local_table, local_written = _replay_block(kt, vt, wt, zero_t, zero_w)

    # exclusive overwrite-scan across blocks (log depth)
    def combine(a, b):  # a older, b newer
        at, aw = a
        bt, bw = b
        return jnp.where(bw, bt, at), aw | bw

    inc_table, inc_written = jax.lax.associative_scan(
        combine, (local_table, local_written), axis=0
    )
    # shift to exclusive, seeding block 0 with `incoming` (or the zero table)
    if incoming is None:
        seed_t = jnp.zeros((1, _SLOTS), jnp.uint32)
        seed_w = jnp.zeros((1, _SLOTS), bool)
    else:
        seed_t = incoming[0][None].astype(jnp.uint32)
        seed_w = incoming[1][None]
    inc_table = jnp.concatenate([seed_t, inc_table[:-1]], axis=0)
    inc_written = jnp.concatenate([seed_w, inc_written[:-1]], axis=0)
    if incoming is not None:
        inc_table = jnp.where(inc_written, inc_table, seed_t)
        inc_written = inc_written | seed_w

    # pass 2: real replay from incoming state
    before_t, fin_table, fin_written = _replay_block(
        kt, vt, wt, jnp.where(inc_written, inc_table, 0), inc_written
    )

    before = before_t.T.reshape(-1)[:n]
    return before, (fin_table[-1], fin_written[-1])
