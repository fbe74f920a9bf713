"""Parallel chunk tokenization via finite-state-machine composition.

The decode-side cursor problem (SURVEY.md §7.3): chunk boundaries are
data-dependent, but each chunk's byte length is a pure function of its
first byte (reference qoi.h:547-575):

    0xFE (RGB)  -> 4      0xFF (RGBA) -> 5
    tag 10 (LUMA) -> 2    else (INDEX/DIFF/RUN) -> 1

So "is byte i a chunk start?" is a 5-state FSM over the byte stream, where
the state is bytes-remaining-until-next-chunk-start (0..4):

    s == 0:  s' = len(byte) - 1      (this byte starts a chunk)
    s  > 0:  s' = s - 1

Each byte's transition is a map {0..4} -> {0..4}; maps compose
associatively, so all states resolve with one `lax.associative_scan` over
(N, 5) int8 transition tables — log depth, fully data-parallel, the direct
analog of simdjson-style structural indexing.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import format as fmt

_NSTATES = 5


def chunk_byte_len(b: jnp.ndarray) -> jnp.ndarray:
    """Chunk length implied by a first byte (reference qoi.h:547-575)."""
    b = b.astype(jnp.int32)
    two_bit = b & fmt.MASK_2
    return jnp.where(
        b == fmt.OP_RGB, 4,
        jnp.where(b == fmt.OP_RGBA, 5,
                  jnp.where(two_bit == fmt.OP_LUMA, 2, 1)))


def chunk_starts(data: jnp.ndarray, chunks_len) -> jnp.ndarray:
    """Boolean chunk-start mask over the byte stream.

    data: (M,) uint8 chunk bytes (stream minus 14-byte header; may include
    the 8-byte trailer — positions >= chunks_len are never marked, matching
    the reference's `p < chunks_len` read guard, qoi.h:544).
    chunks_len: traced int32 count of real chunk bytes.

    Returns (M,) bool, True where a chunk begins.
    """
    m = data.shape[0]
    lens = chunk_byte_len(data)  # (M,)

    states = jnp.arange(_NSTATES, dtype=jnp.int8)
    # trans[i, s]: state after byte i given state s before it
    trans = jnp.where(
        states[None, :] == 0,
        (lens[:, None] - 1).astype(jnp.int8),
        (states[None, :] - 1).astype(jnp.int8),
    )  # (M, 5)

    def compose(a, b):
        """b after a: c[s] = b[a[s]] — 5-way select, VPU-friendly."""
        c = jnp.zeros_like(a)
        for k in range(_NSTATES):
            c = jnp.where(a == k, b[..., k : k + 1], c)
        return c

    # inclusive scan -> state AFTER byte i, given initial state 0
    after = jax.lax.associative_scan(compose, trans, axis=0)
    state_after = after[:, 0]  # (M,) int8, start state 0
    # state BEFORE byte i = state after byte i-1 (0 before byte 0)
    state_before = jnp.concatenate(
        [jnp.zeros((1,), jnp.int8), state_after[:-1]])
    io = jnp.arange(m, dtype=jnp.int32)
    return (state_before == 0) & (io < jnp.asarray(chunks_len, jnp.int32))
