"""Strict-mode tiled encode vs the C++ oracle, on a virtual 8-device mesh.

Exercises every cross-tile carry (SURVEY.md §7.2 stage 5): runs crossing
tile boundaries (including exact 62-cap alignment), table state reuse
across tiles, boundary DIFF/LUMA deltas, and trailing-pad tiles.
"""
import numpy as np
import pytest

import qoi_tpu.format as fmt
from qoi_tpu import oracle
from qoi_tpu.parallel import sharding, tiled
from qoi_tpu.utils import testimages

pytestmark = [
    pytest.mark.skipif(not oracle.available(), reason="oracle not built"),
    pytest.mark.slow,  # quick tier: -m "not slow"
]


def _mesh():
    import jax

    n = min(len(jax.devices()), 8)
    return sharding.make_mesh(data=1, seq=n)


def _check(img: np.ndarray, mesh) -> None:
    h, w, ch = img.shape
    desc = fmt.StreamDesc(w, h, ch)
    got = tiled.encode_tiled(img, desc, mesh)
    want = oracle.encode(img, desc)
    assert got == want


@pytest.mark.parametrize("name", sorted(testimages.edge_case_suite(4)))
def test_tiled_edge_cases_rgba(name):
    mesh = _mesh()
    _check(testimages.edge_case_suite(4)[name], mesh)


@pytest.mark.parametrize("name", ["gradient", "palette", "mixed", "flat_70px"])
def test_tiled_edge_cases_rgb(name):
    mesh = _mesh()
    _check(testimages.edge_case_suite(3)[name], mesh)


def test_seed_pixel_at_tile_boundary():
    """Round-5 fused-summary corner: a tile whose FIRST pixel is the
    seed (0,0,0,255) while the true incoming pixel differs. Phase A
    (which assumes a seed prev) sees position 0 as run-eq and misses the
    table write of the seed at slot 53; the replicated compose must
    patch it back in, or a later seed-valued pixel would miss its
    OP_INDEX hit. Built so tile boundaries land exactly on seed pixels
    on an 8-tile mesh, with later seed pixels probing slot 53."""
    mesh = _mesh()
    n = 1024  # 8 tiles x 128
    img = np.zeros((1, n, 4), np.uint8)
    img[..., :3] = 77
    img[..., 3] = 255
    for t in range(1, 8):  # tile starts at the seed value, prev differs
        img[0, t * 128] = (0, 0, 0, 255)
        img[0, t * 128 + 60] = (0, 0, 0, 255)  # later INDEX probe of slot 53
        img[0, t * 128 + 61] = (t * 31 % 256, 5, 9, 255)
    _check(img, mesh)


def test_boundary_eq_spurious_write():
    """The other fused-summary corner: a tile whose first pixel EQUALS
    the true incoming pixel but differs from the seed — phase A writes
    its hash slot where the true encoder writes nothing. The write is
    provably shadow-identical (the run invariant already has that value
    in the slot); this pins the derivation with runs crossing every
    boundary at varied values."""
    mesh = _mesh()
    n = 1024
    img = np.zeros((1, n, 4), np.uint8)
    img[..., 3] = 255
    v = 0
    for i in range(0, n, 96):  # 96 !% 128: runs straddle boundaries
        v = (v + 13) % 250 + 1
        img[0, i:i + 96, 0] = v
    _check(img, mesh)


def test_run_crossing_tile_boundaries():
    """Flat stretches sized so runs straddle every tile boundary, with a
    tile count that doesn't divide the pixel count."""
    mesh = _mesh()
    rng = np.random.default_rng(7)
    # 1 x 1003 image: tiles of ceil(1003/8)=126 px; runs of 40..200 px
    flat = np.empty((1, 1003, 4), np.uint8)
    pos = 0
    while pos < 1003:
        ln = int(rng.integers(40, 200))
        flat[0, pos : pos + ln] = rng.integers(0, 256, size=4, dtype=np.uint8)
        pos += ln
    _check(flat, mesh)


def test_run_cap_aligned_with_boundary():
    """A 62*8-pixel single run: every tile boundary lands exactly on a
    62-cap flush point."""
    mesh = _mesh()
    img = testimages.flat(62 * 8, 1, 4)
    _check(img, mesh)


def test_all_tiles_one_run():
    """One run spanning the whole stream: all-eq tiles must compose the
    pending-run phase across every boundary."""
    mesh = _mesh()
    _check(testimages.flat(97, 13, 4), mesh)


def test_table_hits_across_tiles():
    """Palette image whose colors repeat across tiles: INDEX ops in tile k
    must see table entries written in tiles < k."""
    mesh = _mesh()
    _check(testimages.palette(500, 3, 4, colors=9, seed=3), mesh)


def test_noise_large_odd_size():
    mesh = _mesh()
    _check(testimages.noise(331, 7, 4, seed=11), mesh)
