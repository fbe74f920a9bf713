"""Parallel encode pipeline vs oracle: must be byte-identical
(SURVEY.md §7.4 step 4 differential strategy)."""
import numpy as np
import pytest

from qoi_tpu import format as fmt
from qoi_tpu import oracle
from qoi_tpu.models import pipeline
from qoi_tpu.ops import compact, scans
from qoi_tpu.utils import testimages

import jax.numpy as jnp

pytestmark = pytest.mark.skipif(not oracle.available(), reason="no C++ toolchain")


@pytest.mark.parametrize("ch", [3, 4])
def test_encode_matches_oracle(ch):
    for name, img in testimages.edge_case_suite(ch).items():
        h, w = img.shape[:2]
        desc = fmt.StreamDesc(w, h, ch)
        expect = oracle.encode(img, desc)
        got = pipeline.encode(img, desc)
        assert got == expect, (
            f"{name}: {len(got)} vs {len(expect)} bytes; "
            f"first diff at {next((i for i, (a, b) in enumerate(zip(got, expect)) if a != b), -1)}"
        )


def test_encode_random_images():
    rng = np.random.default_rng(11)
    for _ in range(8):
        w, h = int(rng.integers(1, 80)), int(rng.integers(1, 40))
        ch = int(rng.choice([3, 4]))
        style = int(rng.integers(0, 3))
        if style == 0:
            img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        elif style == 1:
            img = rng.integers(0, 3, size=(h, w, ch), dtype=np.uint8) * 90
        else:
            pal = rng.integers(0, 256, size=(4, ch), dtype=np.uint8)
            img = pal[rng.integers(0, 4, size=(h, w))]
        desc = fmt.StreamDesc(w, h, ch)
        assert pipeline.encode(img, desc) == oracle.encode(img, desc)


def test_run_segmentation_props():
    # all-equal stream of 130: emission at 62, 124, and the final pixel (6)
    eq = jnp.ones(130, bool)
    runs = scans.run_segmentation(eq)
    pts = np.flatnonzero(np.asarray(runs.emits_run))
    assert list(pts) == [61, 123, 129]
    vals = np.asarray(runs.run_val)[pts]
    assert list(vals) == [62, 62, 6]
    # no flushes since nothing is a literal
    assert not np.asarray(runs.flush).any()


def test_flush_after_run():
    eq = jnp.array([False, True, True, False, False])
    runs = scans.run_segmentation(eq)
    assert list(np.asarray(runs.flush)) == [False, False, False, True, False]
    assert np.asarray(runs.flush_val)[3] == 2


def test_compact_merge_equals_scatter():
    rng = np.random.default_rng(3)
    n, k = 64, 6
    staging = rng.integers(1, 256, size=(n, k), dtype=np.uint8)
    lens = rng.integers(0, k + 1, size=(n,)).astype(np.int32)
    cap = int(lens.sum()) + 8
    a, ta = compact.compact_bytes(jnp.asarray(staging), jnp.asarray(lens), cap)
    b, tb = compact.compact_bytes_merge(jnp.asarray(staging), jnp.asarray(lens))
    assert int(ta) == int(tb) == lens.sum()
    assert np.array_equal(np.asarray(a)[: int(ta)], np.asarray(b)[: int(tb)])


@pytest.mark.parametrize("n", [4096 * 3, 4096 * 2 + 100, 512, 64])
@pytest.mark.parametrize("lens_kind", ["mixed", "dense6", "sparse", "empty"])
def test_compact_bytes6_wordsum(n, lens_kind):
    """The word-sum placement primitive (cumsum-difference assembly, no
    sort/gather/kernel) must agree byte-for-byte with the sort-based
    compaction across segment geometries (multi-segment, fallback seg=n)
    and record-length regimes, including totals not divisible by 4 and
    all-empty stagings."""
    rng = np.random.default_rng(n * 7 + len(lens_kind))
    k = 6
    staging = rng.integers(1, 256, size=(n, k), dtype=np.uint8)
    if lens_kind == "mixed":
        lens = rng.integers(0, k + 1, size=(n,)).astype(np.int32)
    elif lens_kind == "dense6":
        lens = np.full((n,), 6, np.int32)
        lens[-1] = 5  # force a final partial word
    elif lens_kind == "sparse":
        lens = np.where(rng.random(n) < 0.05,
                        rng.integers(1, k + 1, size=(n,)), 0).astype(np.int32)
    else:
        lens = np.zeros((n,), np.int32)
    cap = ((n * k + 3) // 4) * 4
    a, ta = compact.compact_bytes6_wordsum(
        jnp.asarray(staging.T.copy()), jnp.asarray(lens), cap)
    b, tb = compact.compact_bytes(jnp.asarray(staging), jnp.asarray(lens), cap)
    assert int(ta) == int(tb) == lens.sum()
    assert np.array_equal(np.asarray(a)[: int(ta)], np.asarray(b)[: int(tb)])
    # the radix-4 slide (two distance bits per pass) and the words_out
    # form (u32 little-endian words, host .view is free) must agree too
    a4, t4 = compact.compact_bytes6_wordsum(
        jnp.asarray(staging.T.copy()), jnp.asarray(lens), cap, radix=4)
    assert int(t4) == int(ta)
    assert np.array_equal(np.asarray(a4)[: int(ta)], np.asarray(b)[: int(tb)])
    w, tw = compact.compact_bytes6_wordsum(
        jnp.asarray(staging.T.copy()), jnp.asarray(lens), cap,
        words_out=True)
    assert int(tw) == int(ta)
    assert np.array_equal(
        np.asarray(w).view(np.uint8)[: int(ta)], np.asarray(b)[: int(tb)])
    # subrow-relative slide (log2(sub_rows) passes + subrow scatter)
    from qoi_tpu.kernels.pack import _record_words

    lo, hl = _record_words(jnp.asarray(staging.T.copy()), jnp.asarray(lens))
    for r in (128, 512):
        sr, tr = compact.compact_words6_wordsum(
            lo.view(jnp.uint32), (hl & 0xFFFF).view(jnp.uint32),
            jnp.asarray(lens), cap, sub_rows=r)
        assert int(tr) == int(ta)
        assert np.array_equal(np.asarray(sr)[: int(ta)],
                              np.asarray(b)[: int(tb)])
    # the VMEM slide kernel (kernels/slide.py, interpret mode on CPU)
    sk, tk = compact.compact_words6_wordsum(
        lo.view(jnp.uint32), (hl & 0xFFFF).view(jnp.uint32),
        jnp.asarray(lens), cap, slide="kernel", interpret=True)
    assert int(tk) == int(ta)
    assert np.array_equal(np.asarray(sk)[: int(ta)],
                          np.asarray(b)[: int(tb)])


@pytest.mark.parametrize("case", ["mixed", "palette_alpha", "flat", "noise"])
def test_stage_words_matches_bytes(case):
    """form='words' staging must emit exactly the (lo, hi) record words
    kernels/pack._record_words derives from the byte-plane staging, for
    every chunk class (runs/flush, INDEX, DIFF, LUMA, RGB, RGBA), plus
    an identical carry."""
    from qoi_tpu.kernels import pack as kpack

    w, h = 120, 50
    img = {"mixed": lambda: testimages.mixed(w, h, 4),
           "palette_alpha": lambda: testimages.palette_alpha(w, h),
           "flat": lambda: testimages.flat(w, h, 4),
           "noise": lambda: testimages.noise(w, h, 4)}[case]()
    px4 = jnp.asarray(pipeline.force_rgba(img, fmt.StreamDesc(w, h, 4)))
    cb = pipeline.encode_stage_chunks(px4, jnp.int32(w * h))
    lo_b, hl_b = kpack._record_words(cb.staging, cb.lens)
    cw = pipeline.encode_stage_chunks(px4, jnp.int32(w * h), form="words")
    assert np.array_equal(np.asarray(cw.lens), np.asarray(cb.lens))
    assert np.array_equal(np.asarray(cw.lo),
                          np.asarray(lo_b).view(np.uint32))
    assert np.array_equal(np.asarray(cw.hi),
                          np.asarray(hl_b).view(np.uint32) & 0xFFFF)
    for a, b in zip(cw.carry, cb.carry):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # end-to-end: the fused words program is byte-identical to the oracle
    words, total = pipeline.encode_device_wordsum(
        px4, jnp.int32(w * h), seg=1024)
    stream = (fmt.pack_header(fmt.StreamDesc(w, h, 4))
              + np.asarray(words).view(np.uint8)[: int(total)].tobytes()
              + fmt.TRAILER)
    assert stream == oracle.encode(
        pipeline.force_rgba(img, fmt.StreamDesc(w, h, 4)).reshape(h, w, 4),
        fmt.StreamDesc(w, h, 4))


@pytest.mark.parametrize("n", [4096 * 3, 4096 * 2 + 100, 512])
def test_compact_bytes6_both_tiers(n):
    """compact_bytes6's two-tier segment-sort path (n divisible by the
    4096 segment, n >= 2 segments) and its global-sort fallback must agree
    with the plain sort-based compaction byte for byte."""
    rng = np.random.default_rng(n)
    k = 6
    staging = rng.integers(1, 256, size=(n, k), dtype=np.uint8)
    lens = rng.integers(0, k + 1, size=(n,)).astype(np.int32)
    cap = n * k
    a, ta = compact.compact_bytes6(
        jnp.asarray(staging.T.copy()), jnp.asarray(lens), cap)
    b, tb = compact.compact_bytes(jnp.asarray(staging), jnp.asarray(lens), cap)
    assert int(ta) == int(tb) == lens.sum()
    assert np.array_equal(np.asarray(a)[: int(ta)], np.asarray(b)[: int(tb)])
