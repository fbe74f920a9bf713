"""Pointer-doubling resolution of additive copy-chains (decode stage).

After tokenization (ops/fsm.py) and INDEX-target resolution (ops/table.py),
every decoded chunk's pixel value is one of (SURVEY.md §7.3):

    RGBA          -> all four channels anchored (exact bytes)
    RGB           -> r,g,b anchored; alpha copied from the previous chunk
    DIFF / LUMA   -> previous chunk's value + a known mod-256 delta (rgb)
    RUN / INDEX   -> a copy of some earlier chunk's value

i.e. value[i,c] = anchored[i,c] ? anchor[i,c]
                                : value[parent[i,c], c] + delta[i,c]  (mod 256)

a forest of additive chains. `resolve` computes every value in
O(log chain-length) rounds of vectorized gathers (pointer jumping with an
accumulated-delta monoid) — no sequential per-chunk scan.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def resolve(
    parent: jnp.ndarray,
    delta: jnp.ndarray,
    anchored: jnp.ndarray,
    anchor: jnp.ndarray,
    root_val: jnp.ndarray,
) -> jnp.ndarray:
    """Resolve all chain values by pointer doubling.

    Args:
      parent:   (N, C) int32 — parent node per channel; -1 = virtual root.
      delta:    (N, C) uint8 — mod-256 delta applied on top of the parent.
      anchored: (N, C) bool — channel value known exactly at this node.
      anchor:   (N, C) uint8 — the exact value where anchored.
      root_val: (C,) uint8 — value of the virtual root node (the seed pixel).

    Returns (N, C) uint8 resolved values.
    """
    n, c = parent.shape
    # node n is the virtual root: done, value = root_val, self-parent
    p = jnp.concatenate([jnp.where(parent < 0, n, parent),
                         jnp.full((1, c), n, jnp.int32)])
    acc = jnp.concatenate([delta, jnp.zeros((1, c), jnp.uint8)])
    done = jnp.concatenate([anchored, jnp.ones((1, c), bool)])
    val = jnp.concatenate([jnp.where(anchored, anchor, 0),
                           root_val[None].astype(jnp.uint8)])

    def body(state):
        p, acc, val, done, _ = state
        pdone = jnp.take_along_axis(done, p, axis=0)
        pval = jnp.take_along_axis(val, p, axis=0)
        pacc = jnp.take_along_axis(acc, p, axis=0)
        pp = jnp.take_along_axis(p, p, axis=0)

        hop = ~done & pdone       # parent resolved: finish here
        jump = ~done & ~pdone     # both pending: double the pointer

        val = jnp.where(hop, pval + acc, val)
        done = done | pdone
        acc = jnp.where(jump, acc + pacc, acc)
        p = jnp.where(jump, pp, p)
        return p, acc, val, done, jnp.all(done)

    def cond(state):
        return ~state[4]

    state = (p, acc, val, done, jnp.all(done))
    p, acc, val, done, _ = jax.lax.while_loop(cond, body, state)
    return val[:n]


def resolve_roots(
    parent: jnp.ndarray,
    delta: jnp.ndarray,
    done0: jnp.ndarray,
    n_extra: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pointer doubling that reports the reached root instead of a value.

    Nodes 0..N-1 are real; nodes N..N+n_extra-1 are caller-defined roots
    (already done — e.g. incoming-state symbols in sharded decode,
    parallel/tiled_decode.py). `parent` may point at any node (real or
    extra); -1 maps to extra node 0.

    Args:
      parent: (N, C) int32; done0: (N, C) bool marks real nodes that are
        roots themselves; delta: (N, C) uint8 additive payload.

    Returns (root (N, C) int32 in [0, N+n_extra), acc (N, C) uint8):
      node value = base_value(root) + acc (mod 256), where base_value of a
      done real node is its own (caller-known) value and of an extra node
      the caller's symbol value.
    """
    n, c = parent.shape
    p = jnp.concatenate([
        jnp.where(parent < 0, n, parent),
        n + jnp.zeros((n_extra, c), jnp.int32)
        + jnp.arange(n_extra, dtype=jnp.int32)[:, None],
    ])
    # invariant: value(i) = value(p[i]) + acc[i]; for done i, p[i] is its
    # root and acc[i] the path sum (0 for a root itself)
    acc = jnp.concatenate(
        [jnp.where(done0, 0, delta), jnp.zeros((n_extra, c), jnp.uint8)])
    done = jnp.concatenate([done0, jnp.ones((n_extra, c), bool)])
    # done nodes point at themselves so the reached root is the node itself
    io = jnp.arange(n + n_extra, dtype=jnp.int32)[:, None]
    p = jnp.where(done, io, p)

    def body(state):
        p, acc, done, _ = state
        pdone = jnp.take_along_axis(done, p, axis=0)
        pacc = jnp.take_along_axis(acc, p, axis=0)
        pp = jnp.take_along_axis(p, p, axis=0)
        jump = ~done
        # p[q] of a done parent q is its root and acc[q] its path sum, so
        # one more hop lands exactly on the root with the full path sum
        acc = jnp.where(jump, acc + pacc, acc)
        p = jnp.where(jump, pp, p)
        done = done | (jump & pdone)
        return p, acc, done, jnp.all(done)

    state = (p, acc, done, jnp.all(done))
    p, acc, done, _ = jax.lax.while_loop(lambda s: ~s[3], body, state)
    return p[:n], acc[:n]
