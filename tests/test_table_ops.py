"""ops/table.py unit tests vs a direct numpy replay (SURVEY §2.2 property)."""
import numpy as np
import pytest

import jax.numpy as jnp

from qoi_tpu.ops import table


def _np_replay(keys, vals, write, tbl0=None, wr0=None, qkeys=None):
    n = len(keys)
    t = np.zeros(64, np.uint32) if tbl0 is None else np.where(wr0, tbl0, 0).astype(np.uint32)
    w = np.zeros(64, bool) if wr0 is None else wr0.copy()
    before = np.zeros(n, np.uint32)
    hit = np.zeros(n, bool)
    qk = keys if qkeys is None else qkeys
    for i in range(n):
        before[i] = t[qk[i]]
        hit[i] = t[keys[i]] == vals[i]
        if write[i]:
            t[keys[i]] = vals[i]
            w[keys[i]] = True
    return before, hit, np.where(w, t, 0), w


@pytest.mark.parametrize("n", [1, 63, 64, 65, 1000, 4096])
def test_table_hit_matches_replay(n):
    rng = np.random.default_rng(n)
    keys = rng.integers(0, 64, n).astype(np.int32)
    vals = (rng.integers(0, 6, n) * 999983).astype(np.uint32)  # collisions
    write = rng.integers(0, 2, n).astype(bool)
    _, want_hit, want_t, want_w = _np_replay(keys, vals, write)
    hit, (ft, fw) = table.table_hit(
        jnp.asarray(keys), jnp.asarray(vals), jnp.asarray(write))
    np.testing.assert_array_equal(np.asarray(hit), want_hit)
    np.testing.assert_array_equal(np.asarray(ft), want_t)
    np.testing.assert_array_equal(np.asarray(fw), want_w)


def test_table_hit_incoming_state():
    rng = np.random.default_rng(7)
    n = 500
    keys = rng.integers(0, 64, n).astype(np.int32)
    vals = (rng.integers(0, 4, n) * 777).astype(np.uint32)
    write = rng.integers(0, 2, n).astype(bool)
    tbl0 = rng.integers(0, 2**32, 64, dtype=np.uint32)
    wr0 = rng.integers(0, 2, 64).astype(bool)
    # make some incoming entries hittable
    for i in range(0, n, 17):
        s = keys[i]
        if wr0[s]:
            vals[i] = tbl0[s]
    _, want_hit, want_t, want_w = _np_replay(keys, vals, write, tbl0, wr0)
    hit, (ft, fw) = table.table_hit(
        jnp.asarray(keys), jnp.asarray(vals), jnp.asarray(write),
        incoming=(jnp.asarray(tbl0), jnp.asarray(wr0)))
    np.testing.assert_array_equal(np.asarray(hit), want_hit)
    np.testing.assert_array_equal(np.asarray(ft), want_t)
    np.testing.assert_array_equal(np.asarray(fw), want_w)


def test_table_hit_zero_entry_semantics():
    """Unwritten slots hold (0,0,0,0): packed 0 hits, others miss."""
    keys = np.array([0, 5, 0], np.int32)
    vals = np.array([0, 0, 0], np.uint32)
    write = np.array([False, False, True])
    hit, _ = table.table_hit(jnp.asarray(keys), jnp.asarray(vals), jnp.asarray(write))
    np.testing.assert_array_equal(np.asarray(hit), [True, True, True])


@pytest.mark.parametrize("n", [100, 2000])
def test_table_replay_query_keys(n):
    rng = np.random.default_rng(n + 1)
    keys = rng.integers(0, 64, n).astype(np.int32)
    qkeys = rng.integers(0, 64, n).astype(np.int32)
    vals = rng.integers(0, 2**32, n, dtype=np.uint32)
    write = rng.integers(0, 2, n).astype(bool)
    want_before, _, want_t, want_w = _np_replay(keys, vals, write, qkeys=qkeys)
    before, (ft, fw) = table.table_replay(
        jnp.asarray(keys), jnp.asarray(vals), jnp.asarray(write),
        query_keys=jnp.asarray(qkeys))
    np.testing.assert_array_equal(np.asarray(before), want_before)
    np.testing.assert_array_equal(np.asarray(ft), want_t)
    np.testing.assert_array_equal(np.asarray(fw), want_w)
