"""Streamed tile-chained encode vs the oracle: every carry crosses tile
boundaries (runs, 62-cap phase, table state, boundary pixel)."""
import numpy as np
import pytest

import qoi_tpu.format as fmt
from qoi_tpu import oracle
from qoi_tpu.models import streamed
from qoi_tpu.utils import testimages

pytestmark = [
    pytest.mark.skipif(not oracle.available(), reason="oracle not built"),
    pytest.mark.slow,  # quick tier: -m "not slow"
]


def _check(img, tile_px):
    h, w, ch = img.shape
    desc = fmt.StreamDesc(w, h, ch)
    assert streamed.encode(img, desc, tile_px=tile_px) == oracle.encode(img, desc)


@pytest.mark.parametrize("tile_px", [256, 1024])
def test_streamed_mixed(tile_px):
    _check(testimages.mixed(100, 40, 4), tile_px)


def test_streamed_run_across_many_tiles():
    _check(testimages.flat(64, 40, 4), 256)  # one 2560-px run over 10 tiles


def test_streamed_run_cap_aligned():
    _check(testimages.flat(62 * 4, 2, 4), 62 * 4)  # tiles end on cap flushes


def test_streamed_table_reuse_across_tiles():
    _check(testimages.palette(128, 20, 4, colors=7, seed=9), 256)


def test_streamed_odd_sizes_and_padding():
    _check(testimages.gradient(97, 13, 3), 256)
    _check(testimages.noise(301, 3, 4, seed=4), 512)


def test_streamed_single_tile_path():
    img = testimages.mixed(50, 20, 3)
    _check(img, 1 << 22)
