"""Variable-length byte-record compaction (SURVEY.md §7.2 stage 5).

Each pixel yields 0..6 stream bytes; compaction packs them contiguously at
exclusive-prefix-sum offsets. Three device implementations:

  * `compact_bytes` — sort-based: each staged byte is keyed by its target
    stream offset (invalid bytes key past the end) and one stable
    `sort_key_val` produces the packed stream. On TPU this is by far the
    fastest path (~0.2 ms for 50M staged bytes on v5e; a byte-level XLA
    scatter takes ~400 ms).
  * `compact_bytes_scatter` — XLA scatter baseline, kept for differential
    testing.
  * `compact_bytes_merge` — scatter-free log-depth pairwise merge via
    barrel shifts; kept as a dense-VPU alternative.

All return (buffer, total_len) with identical contents in [0, total).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .scans import exclusive_cumsum


def compact_bytes(
    staging: jnp.ndarray, lens: jnp.ndarray, capacity: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sort-based compaction. staging: (N, K) uint8; lens: (N,) int32 with
    lens[i] <= K; capacity: static output size (>= total bytes)."""
    n, k = staging.shape
    offs = exclusive_cumsum(lens)
    total = offs[-1] + lens[-1] if n else jnp.int32(0)
    col = jnp.arange(k, dtype=jnp.int32)[None, :]
    valid = col < lens[:, None]
    tgt = jnp.where(valid, offs[:, None] + col, n * k).reshape(-1)
    _, packed = jax.lax.sort_key_val(tgt, staging.reshape(-1))
    if capacity <= n * k:
        out = packed[:capacity]
    else:
        out = jnp.concatenate(
            [packed, jnp.zeros((capacity - n * k,), jnp.uint8)])
    # int32 is safe: the PIXELS_MAX guard caps worst-case streams below 2 GiB
    return out, total.astype(jnp.int32)


def compact_bytes_scatter(
    staging: jnp.ndarray, lens: jnp.ndarray, capacity: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter-based compaction baseline (differential testing)."""
    n, k = staging.shape
    offs = exclusive_cumsum(lens)
    total = offs[-1] + lens[-1] if n else jnp.int32(0)
    col = jnp.arange(k, dtype=jnp.int32)[None, :]
    valid = col < lens[:, None]
    pos = jnp.where(valid, offs[:, None] + col, capacity)  # OOB -> dropped
    out = jnp.zeros((capacity,), jnp.uint8)
    out = out.at[pos.reshape(-1)].set(staging.reshape(-1), mode="drop")
    return out, total.astype(jnp.int32)


def _barrel_shift_right(x: jnp.ndarray, shift: jnp.ndarray, max_shift: int) -> jnp.ndarray:
    """Per-row right-shift of byte rows by a dynamic amount, as a composition
    of static rolls selected by the bits of `shift`. x: (R, W) uint8;
    shift: (R,) int32 in [0, max_shift]. Vacated bytes are garbage (callers
    mask); bytes shifted past W are dropped."""
    w = x.shape[-1]
    bit = 1
    while bit <= max_shift and bit < w:
        rolled = jnp.roll(x, bit, axis=-1)
        keep = jnp.arange(w, dtype=jnp.int32)[None, :] >= bit  # zero wrapped-in
        rolled = jnp.where(keep, rolled, 0)
        x = jnp.where((shift & bit)[:, None].astype(bool), rolled, x)
        bit <<= 1
    return x


def compact_bytes_merge(
    staging: jnp.ndarray, lens: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter-free compaction by log-depth pairwise record merging.

    staging: (N, K) uint8 where row i holds lens[i] valid leading bytes.
    N must be a power of two (pad with zero-length rows). Returns
    (flat (N*K,) uint8, total int64).
    """
    n, k = staging.shape
    assert n & (n - 1) == 0, "pad record count to a power of two"
    # zero the invalid tail of every record so OR-merging is clean
    col = jnp.arange(k, dtype=jnp.int32)[None, :]
    data = jnp.where(col < lens[:, None], staging, 0)
    cur_len = lens.astype(jnp.int32)
    width = k

    while data.shape[0] > 1:
        rows = data.shape[0]
        first = data[0::2]
        second = data[1::2]
        len1 = cur_len[0::2]
        len2 = cur_len[1::2]
        new_width = width * 2
        first = jnp.pad(first, ((0, 0), (0, new_width - width)))
        second = jnp.pad(second, ((0, 0), (0, new_width - width)))
        second = _barrel_shift_right(second, len1, max_shift=width)
        # valid regions are disjoint: [0,len1) and [len1,len1+len2)
        data = first | second
        cur_len = len1 + len2
        width = new_width
        del rows

    total = cur_len[0].astype(jnp.int32)
    return data[0], total
