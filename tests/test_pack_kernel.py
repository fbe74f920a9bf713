"""Differential tests for the Pallas stream-packing kernel
(kernels/pack.py) against the sort-based compaction it replaces.

Interpret mode on CPU; the kernel's window/anchor bounds are content-
independent (records emit >= 1 byte after densification), so the
adversarial cases here target geometry: word/tile boundary straddles,
long zero-emitter gaps, worst-case 6-byte records, and empty streams.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import qoi_tpu
from qoi_tpu import format as fmt, oracle
from qoi_tpu.kernels import pack
from qoi_tpu.models import pipeline
from qoi_tpu.ops import compact
from qoi_tpu.utils import testimages


def _ref(staging6, lens, capacity):
    buf, tot = compact.compact_bytes6(
        jnp.asarray(staging6), jnp.asarray(lens), capacity)
    tot = int(tot)
    return np.asarray(buf)[:tot], tot


def _got(staging6, lens, capacity, **kw):
    buf, tot = pack.compact_bytes6_pack(
        jnp.asarray(staging6), jnp.asarray(lens), capacity,
        interpret=True, **kw)
    tot = int(tot)
    return np.asarray(buf)[:tot], tot


def _check(staging6, lens, capacity, **kw):
    rbuf, rtot = _ref(staging6, lens, capacity)
    gbuf, gtot = _got(staging6, lens, capacity, **kw)
    assert gtot == rtot
    np.testing.assert_array_equal(gbuf, rbuf)


def _random_staging(n, rng, p_zero=0.5):
    lens = rng.choice([0, 1, 2, 3, 4, 5, 6], size=n,
                      p=[p_zero] + [(1 - p_zero) / 6] * 6)
    staging = rng.integers(0, 256, size=(6, n), dtype=np.uint8)
    col = np.arange(6)[:, None]
    staging = np.where(col < lens[None, :], staging, 0).astype(np.uint8)
    return staging, lens.astype(np.int32)


@pytest.mark.parametrize("densify", ["shift", "sort"])
def test_random_mixed_lens(densify):
    rng = np.random.default_rng(0)
    staging, lens = _random_staging(1 << 14, rng)
    _check(staging, lens, (1 << 14) * 6, densify=densify)


@pytest.mark.parametrize("densify", ["shift", "sort"])
def test_small_stream_single_segment(densify):
    """n below the densify segment size exercises the seg = n path."""
    rng = np.random.default_rng(9)
    staging, lens = _random_staging(1 << 10, rng)
    _check(staging, lens, (1 << 10) * 6, densify=densify)


def test_segment_boundary_emitters():
    """Valid records hugging both sides of every densify-segment edge,
    plus fully-empty and fully-dense segments."""
    rng = np.random.default_rng(10)
    n = 4096 * 4
    staging, lens = _random_staging(n, rng, p_zero=0.0)
    lens = np.zeros(n, np.int32)
    lens[4095], lens[4096] = 5, 6          # straddle the first edge
    lens[8191], lens[8192] = 1, 1          # and the second
    lens[12288:] = 6                       # a fully-dense segment
    staging = np.where(
        np.arange(6)[:, None] < lens[None, :], staging, 0).astype(np.uint8)
    _check(staging, lens, n * 6)


def test_long_zero_gaps():
    """Emitters separated by thousands of zero-length pixels: the
    densify sort must keep the placement windows bounded regardless."""
    rng = np.random.default_rng(1)
    n = 1 << 14
    staging, lens = _random_staging(n, rng, p_zero=0.0)
    keep = np.zeros(n, bool)
    keep[:: 3000] = True
    keep[n - 1] = True
    lens = np.where(keep, lens, 0).astype(np.int32)
    staging = np.where(
        np.arange(6)[:, None] < lens[None, :], staging, 0).astype(np.uint8)
    _check(staging, lens, n * 6)


def test_all_six_byte_records():
    rng = np.random.default_rng(2)
    n = 4096
    staging = rng.integers(0, 256, size=(6, n), dtype=np.uint8)
    lens = np.full(n, 6, np.int32)
    _check(staging, lens, n * 6)


def test_third_word_spill_fold():
    """Records at offset 3 mod 4 with len 6 spill a byte into a third
    output word, folded into the next record's c0 plane — including the
    every-pixel-emits case where the LAST record spills and only the
    appended sentinel slot can catch it."""
    rng = np.random.default_rng(6)
    n = 2048
    staging = rng.integers(0, 256, size=(6, n), dtype=np.uint8)
    lens = np.full(n, 6, np.int32)
    lens[0] = 3                      # offsets become 3, 9, 15, 21, ...
    staging[3:, 0] = 0
    _check(staging, lens, n * 6)     # last record: off%4==3, len 6, R==N


def test_all_one_byte_records():
    rng = np.random.default_rng(3)
    n = 4096
    staging, _ = _random_staging(n, rng, p_zero=0.0)
    lens = np.ones(n, np.int32)
    staging = np.where(
        np.arange(6)[:, None] < 1, staging, 0).astype(np.uint8)
    _check(staging, lens, n * 6)


def test_empty_stream():
    n = 2048
    staging = np.zeros((6, n), np.uint8)
    lens = np.zeros(n, np.int32)
    buf, tot = _got(staging, lens, n * 6)
    assert tot == 0 and buf.size == 0


def test_word_phase_sweep():
    """Every (offset mod 4, len) pair: a leading record of 1..4 bytes
    shifts all downstream offsets through each word phase."""
    rng = np.random.default_rng(4)
    base_staging, base_lens = _random_staging(2048, rng, p_zero=0.3)
    for lead in (1, 2, 3, 4):
        staging = base_staging.copy()
        lens = base_lens.copy()
        lens[0] = lead
        staging[:, 0] = [7, 8, 9, 10, 11, 12]
        staging[lead:, 0] = 0
        _check(staging, lens, 2048 * 6)


def test_tile_and_sub_geometries():
    rng = np.random.default_rng(5)
    staging, lens = _random_staging(1 << 15, rng)
    for tile, sub in ((1024, 128), (2048, 128), (4096, 256)):
        _check(staging, lens, (1 << 15) * 6, tile=tile, sub=sub)


@pytest.mark.parametrize("name,maker", [
    ("mixed", testimages.mixed), ("photo", testimages.photo)])
def test_full_encode_differential(name, maker):
    """Pipeline staging -> pack kernel == the C++ oracle byte stream."""
    w, h = 160, 96
    desc = fmt.StreamDesc(w, h, 4)
    img = maker(w, h, 4, seed=11)
    px4 = pipeline.force_rgba(img, desc)
    n = px4.shape[0]
    cap = pipeline.bucket_size(n)
    padded = np.zeros((cap, 4), np.uint8)
    padded[:n] = px4
    ch = pipeline.encode_stage_chunks(jnp.asarray(padded), jnp.int32(n))
    buf, tot = pack.compact_bytes6_pack(
        ch.staging, ch.lens, cap * 6, interpret=True)
    got = (fmt.pack_header(desc)
           + np.asarray(buf)[: int(tot)].tobytes() + fmt.TRAILER)
    if oracle.available():
        assert got == oracle.encode(img, desc)
    ref_buf, ref_tot = compact.compact_bytes6(ch.staging, ch.lens, cap * 6)
    assert int(tot) == int(ref_tot)
    np.testing.assert_array_equal(
        np.asarray(buf)[: int(tot)], np.asarray(ref_buf)[: int(tot)])


def _dyn_cases():
    """Adversarial geometries for the dynamic-trip-count window: random
    mixed lens, all-6-byte (max row span), all-1-byte (min span), long
    zero gaps (sparse emitters produce the largest cnt/cnte anchor jumps),
    and the third-word spill fold."""
    rng = np.random.default_rng(12)
    cases = []
    staging, lens = _random_staging(1 << 14, rng)
    cases.append((staging, lens))
    n = 4096
    staging = rng.integers(0, 256, size=(6, n), dtype=np.uint8)
    cases.append((staging, np.full(n, 6, np.int32)))
    staging1, _ = _random_staging(n, rng, p_zero=0.0)
    staging1 = np.where(np.arange(6)[:, None] < 1, staging1, 0
                        ).astype(np.uint8)
    cases.append((staging1, np.ones(n, np.int32)))
    staging2 = rng.integers(0, 256, size=(6, 2048), dtype=np.uint8)
    lens2 = np.full(2048, 6, np.int32)
    lens2[0] = 3
    staging2[3:, 0] = 0
    cases.append((staging2, lens2))
    # long zero gaps: emitters thousands of zero-length pixels apart —
    # the dyn loop's group count must survive near-empty subtiles
    n = 1 << 14
    staging3, lens3 = _random_staging(n, rng, p_zero=0.0)
    keep = np.zeros(n, bool)
    keep[::3000] = True
    keep[n - 1] = True
    lens3 = np.where(keep, lens3, 0).astype(np.int32)
    staging3 = np.where(
        np.arange(6)[:, None] < lens3[None, :], staging3, 0).astype(np.uint8)
    cases.append((staging3, lens3))
    return cases


def test_dyn_window_matches_static():
    """window="dyn" must place byte-identically to the static window on
    every adversarial geometry (see _dyn_cases)."""
    for staging, lens in _dyn_cases():
        _check(staging, lens, staging.shape[1] * 6, window="dyn")


def test_dyn_window_geometries():
    """The dyn window at non-default tile/sub geometries (the group-count
    clip ngmax and anchor shifts depend on both)."""
    for staging, lens in _dyn_cases()[:2] + _dyn_cases()[-1:]:
        for tile, sub in ((1024, 128), (4096, 256)):
            _check(staging, lens, staging.shape[1] * 6, window="dyn",
                   tile=tile, sub=sub)


def test_public_split_api_matches_fused():
    """densify_records + place_records (the splitd two-program public
    API used by bench.py / models/batch.py) == compact_bytes6."""
    import jax

    rng = np.random.default_rng(13)
    staging, lens = _random_staging(1 << 14, rng)
    cap = (1 << 14) * 6
    rbuf, rtot = _ref(staging, lens, cap)
    off_d, lo_d, hi_d, total = pack.densify_records(
        jnp.asarray(staging), jnp.asarray(lens))
    buf, tot = pack.place_records(off_d, lo_d, hi_d, total, cap,
                                  interpret=True)
    assert int(tot) == rtot
    np.testing.assert_array_equal(np.asarray(buf)[:rtot], rbuf)


def test_encode_device_pack_oracle():
    """pipeline.encode_device_pack (the production splitd encode) is
    byte-identical to the C++ oracle."""
    w, h = 160, 96
    desc = fmt.StreamDesc(w, h, 4)
    img = testimages.mixed(w, h, 4, seed=21)
    px4 = pipeline.force_rgba(img, desc)
    n = px4.shape[0]
    cap = pipeline.bucket_size(n)
    padded = np.zeros((cap, 4), np.uint8)
    padded[:n] = px4
    buf, tot = pipeline.encode_device_pack(
        jnp.asarray(padded), jnp.int32(n), interpret=True)
    got = (fmt.pack_header(desc)
           + np.asarray(buf)[: int(tot)].tobytes() + fmt.TRAILER)
    if oracle.available():
        assert got == oracle.encode(img, desc)
    else:  # pragma: no cover - oracle always available in CI
        assert got == qoi_tpu.encode(img, desc, engine="scan")
