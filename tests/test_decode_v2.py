"""Gather-free decoder (v2) vs the C++ oracle — same coverage classes as
the v1 pipeline tests plus INDEX-indirection depth cases."""
import numpy as np
import pytest

import qoi_tpu.format as fmt
from qoi_tpu import oracle
from qoi_tpu.models import decode_v2
from qoi_tpu.utils import testimages

pytestmark = pytest.mark.skipif(not oracle.available(), reason="oracle not built")


def _roundtrip(img: np.ndarray) -> None:
    h, w, ch = img.shape
    stream = oracle.encode(img, fmt.StreamDesc(w, h, ch))
    got, gdesc = decode_v2.decode(stream)
    want, wdesc = oracle.decode(stream)
    assert gdesc == wdesc
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("name", sorted(testimages.edge_case_suite(4)))
def test_v2_edge_cases_rgba(name):
    _roundtrip(testimages.edge_case_suite(4)[name])


@pytest.mark.parametrize("name", ["gradient", "palette", "mixed", "noise_small"])
def test_v2_edge_cases_rgb(name):
    _roundtrip(testimages.edge_case_suite(3)[name])


def test_v2_index_indirection_chains():
    """Palette repeats force INDEX chunks whose values flow into later
    table entries read by further INDEX chunks (depth > 1)."""
    _roundtrip(testimages.palette(300, 8, 4, colors=12, seed=13))


def test_v2_alpha_varying():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, size=(8, 64, 4), dtype=np.uint8)
    img[..., 3] = 200
    img[0, 0, 3] = 130
    _roundtrip(img)


def test_v2_truncation_and_channel_forcing():
    img = testimages.mixed(40, 30, 4)
    full = oracle.encode(img, fmt.StreamDesc(40, 30, 4))
    cut = full[: fmt.HEADER_SIZE + 11] + fmt.TRAILER
    got, _ = decode_v2.decode(cut)
    want, _ = oracle.decode(cut)
    np.testing.assert_array_equal(got, want)
    for ch in (0, 3, 4):
        got, _ = decode_v2.decode(full, ch)
        want, _ = oracle.decode(full, ch)
        np.testing.assert_array_equal(got, want)


def test_v2_noncanonical_streams():
    body = bytes([fmt.OP_INDEX | 5, fmt.OP_INDEX | 0, fmt.OP_INDEX | 63,
                  fmt.OP_RGB, 9, 9, 9])
    data = fmt.pack_header(fmt.StreamDesc(4, 1, 4)) + body + fmt.TRAILER
    got, _ = decode_v2.decode(data)
    want, _ = oracle.decode(data)
    np.testing.assert_array_equal(got, want)


def test_v2_random_roundtrips():
    rng = np.random.default_rng(0)
    for _ in range(5):
        w = int(rng.integers(1, 90))
        h = int(rng.integers(1, 40))
        ch = int(rng.choice([3, 4]))
        img = testimages.palette(w, h, ch, colors=int(rng.integers(2, 20)),
                                 seed=int(rng.integers(1 << 30)))
        _roundtrip(img)
