"""Color-index-table replay as a last-writer-wins cumulative max.

The key insight (SURVEY.md §2.2 derived property): after any non-run pixel p
the reference table satisfies index[hash(p)] == p, whether the op was a hit
or a miss (store-on-miss, qoi.h:436; hit means the slot already held the
value). So the table state before pixel i at slot s is simply the value of
the *most recent preceding non-run pixel hashing to s* (or the zero entry) —
independent of which ops the encoder chose.

That reduces table replay to a pure "last writer per slot" query, computed
TPU-natively as a cumulative max over writer positions:

    W[i, s] = i+1  if pixel i writes slot s else 0      (one-hot over 64 lanes)
    lastw   = exclusive cummax of W along i             (log depth, VPU)
    before[i] = vals[lastw[i, keys[i]] - 1]             (one gather)

Blocks of `block` positions are processed under a `lax.scan` carrying the
64-slot writer-position vector, bounding live memory to O(block x 64) while
keeping each step a dense vector op. The 64-slot carry is the same overwrite
monoid exchanged across tiles/devices in strict mode (SURVEY §5.7).
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


def table_replay(
    keys: jnp.ndarray,
    vals: jnp.ndarray,
    write: jnp.ndarray,
    block: int = 1 << 17,
    incoming: Tuple[jnp.ndarray, jnp.ndarray] | None = None,
    query_keys: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Per-position table lookups under last-writer-wins replay.

    Args:
      keys: (N,) int32 slot per position (0..63) — the slot WRITTEN.
      vals: (N,) uint32 packed pixel per position.
      write: (N,) bool — whether this position writes its slot (non-run
        pixels in the encoder; every chunk in the decoder).
      block: positions per scan step; bounds live memory to block x 64 x 4 B.
      incoming: optional initial table state (table (64,) uint32,
        written (64,) bool) — carried across tiles in strict mode.
      query_keys: optional (N,) int32 slot QUERIED by each position
        (defaults to `keys`). The decode-side INDEX resolution reads slot
        b1 while writing slot hash(px) (reference qoi.h:559 vs qoi.h:577);
        they coincide only in canonical streams.

    Returns:
      before: (N,) uint32 — table value at keys[i] just before position i
        (0 for never-written slots: the zero table).
      (final_table, final_written): (64,) uint32 / bool state after all
        positions, for chaining across tiles via collectives (SURVEY §5.7).
    """
    n = keys.shape[0]
    block = min(block, max(n, 1))
    nb = -(-n // block)
    pad = nb * block - n

    if query_keys is None:
        query_keys = keys
    keys_b = jnp.pad(keys, (0, pad)).reshape(nb, block)
    qkeys_b = jnp.pad(query_keys, (0, pad)).reshape(nb, block)
    write_b = jnp.pad(write, (0, pad)).reshape(nb, block)  # pads never write
    pid_b = (jnp.arange(nb * block, dtype=jnp.int32) + 1).reshape(nb, block)
    slots = jnp.arange(_SLOTS, dtype=jnp.int32)

    def body(carry, x):
        k, qk, w, pid = x  # (block,) each
        onehot = w[:, None] & (k[:, None] == slots[None, :])
        wpos = jnp.where(onehot, pid[:, None], 0)  # (block, 64) int32
        cum = jax.lax.cummax(wpos, axis=0)
        excl = jnp.concatenate([carry[None, :], cum[:-1]], axis=0)
        eff = jnp.maximum(excl, carry[None, :])
        idx = jnp.take_along_axis(eff, qk[:, None], axis=1)[:, 0]
        return jnp.maximum(carry, cum[-1]), idx

    final_idx, idx_b = jax.lax.scan(
        body, jnp.zeros((_SLOTS,), jnp.int32), (keys_b, qkeys_b, write_b, pid_b)
    )
    idx = idx_b.reshape(-1)[:n]  # 0 = no writer yet; else writer position + 1

    vals_ext = jnp.concatenate([jnp.zeros((1,), jnp.uint32), vals.astype(jnp.uint32)])
    before = vals_ext[jnp.minimum(idx, n)]

    final_table = vals_ext[jnp.minimum(final_idx, n)]
    final_written = final_idx > 0

    if incoming is not None:
        inc_t, inc_w = incoming
        inc_t = inc_t.astype(jnp.uint32)
        no_writer = idx == 0
        before = jnp.where(no_writer & inc_w[query_keys], inc_t[query_keys], before)
        final_table = jnp.where(final_written, final_table,
                                jnp.where(inc_w, inc_t, 0))
        final_written = final_written | inc_w

    return before, (final_table, final_written)
