"""ops/scans.py unit tests: run segmentation generalizations and the
hierarchical chunked associative scan."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qoi_tpu.ops import scans


@pytest.mark.parametrize("n,seg", [(5, 64), (1000, 64), (130_000, 1024)])
def test_chunked_assoc_scan_add(n, seg):
    rng = np.random.default_rng(n)
    x = jnp.asarray(rng.integers(0, 100, n), jnp.int32)
    want = jax.lax.associative_scan(jnp.add, x, axis=0)
    got = scans.chunked_assoc_scan(jnp.add, x, seg=seg)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("n,seg", [(1000, 64), (50_000, 512)])
def test_chunked_assoc_scan_reset_monoid_pytree(n, seg):
    """The decode-side reset-or-add monoid over a (4, N) pytree."""
    rng = np.random.default_rng(n + 7)
    r = jnp.asarray(rng.integers(0, 2, (4, n)), jnp.uint8)
    v = jnp.asarray(rng.integers(0, 255, (4, n)), jnp.uint8)

    def comb(a, b):
        ra, va = a
        rb, vb = b
        return jnp.maximum(ra, rb), jnp.where(rb != 0, vb, va + vb)

    want = jax.lax.associative_scan(comb, (r, v), axis=-1)
    got = scans.chunked_assoc_scan(comb, (r, v), seg=seg)
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_run_segmentation_with_incoming_run():
    """run_in continues a leading all-eq prefix and flushes before a
    leading literal (SURVEY §7.2 stage 5)."""
    # 5 eq pixels entering with pending 60: positions 61..65 -> emit at 62
    eq = jnp.asarray([True] * 5 + [False] + [True] * 3)
    runs = scans.run_segmentation(eq, run_in=jnp.int32(60))
    emits = np.asarray(runs.emits_run)
    vals = np.asarray(runs.run_val)
    assert emits[1] and vals[1] == 62  # 62-cap flush inside the prefix
    assert not emits[2] and not emits[3]
    # the literal at 5 flushes the remaining pending run of 3
    assert np.asarray(runs.flush)[5] and np.asarray(runs.flush_val)[5] == 3
    # last pixel (index 8) emits the trailing run of 3
    assert emits[8] and vals[8] == 3

    # leading literal with pending run: flush fires at position 0
    eq2 = jnp.asarray([False, True, True])
    runs2 = scans.run_segmentation(eq2, run_in=jnp.int32(7))
    assert np.asarray(runs2.flush)[0] and np.asarray(runs2.flush_val)[0] == 7
