"""Parallel decoder vs the C++ oracle: pixel-exact on every stream class.

Covers the SURVEY.md §4 edge-case corpus (via oracle-encoded canonical
streams), channel forcing, truncation tolerance, alpha-varying streams
(the hash fixpoint's hard case), and hand-crafted non-canonical streams
(INDEX into never-written slots)."""
import numpy as np
import pytest

import qoi_tpu.format as fmt
from qoi_tpu import oracle
from qoi_tpu.models import decode_pipeline
from qoi_tpu.utils import testimages

pytestmark = pytest.mark.skipif(not oracle.available(), reason="oracle not built")


def _roundtrip(img: np.ndarray) -> None:
    h, w, ch = img.shape
    desc = fmt.StreamDesc(w, h, ch)
    stream = oracle.encode(img, desc)
    got, gdesc = decode_pipeline.decode(stream)
    want, wdesc = oracle.decode(stream)
    assert gdesc == wdesc
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("name", sorted(testimages.edge_case_suite(4)))
def test_edge_cases_rgba(name):
    _roundtrip(testimages.edge_case_suite(4)[name])


@pytest.mark.parametrize("name", ["gradient", "palette", "mixed", "noise_small", "flat_70px"])
def test_edge_cases_rgb(name):
    _roundtrip(testimages.edge_case_suite(3)[name])


def test_alpha_varying_rgb_literals():
    """RGBA stream where alpha changes, then RGB literals follow: the
    optimistic-alpha hash guess is wrong and must converge via iteration."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, size=(8, 64, 4), dtype=np.uint8)
    img[..., 3] = 200  # constant != 255 alpha: RGB ops under alpha=200
    img[0, 0, 3] = 130  # an RGBA literal early on
    _roundtrip(img)


def test_channel_forcing():
    img = testimages.mixed(50, 20, 4)
    stream = oracle.encode(img, fmt.StreamDesc(50, 20, 4))
    for ch in (0, 3, 4):
        got, _ = decode_pipeline.decode(stream, ch)
        want, _ = oracle.decode(stream, ch)
        np.testing.assert_array_equal(got, want)

    img3 = testimages.mixed(50, 20, 3)
    stream3 = oracle.encode(img3, fmt.StreamDesc(50, 20, 3))
    for ch in (0, 3, 4):
        got, _ = decode_pipeline.decode(stream3, ch)
        want, _ = oracle.decode(stream3, ch)
        np.testing.assert_array_equal(got, want)


def test_truncation_tolerance():
    """Truncated chunk data decodes with seed/current-px fill, matching the
    reference's p < chunks_len guard (qoi.h:544)."""
    img = testimages.mixed(40, 30, 4)
    full = oracle.encode(img, fmt.StreamDesc(40, 30, 4))
    for cut in (0, 1, 7, len(full) - fmt.HEADER_SIZE - fmt.TRAILER_SIZE - 5):
        data = full[: fmt.HEADER_SIZE + cut] + fmt.TRAILER
        got, _ = decode_pipeline.decode(data)
        want, _ = oracle.decode(data)
        np.testing.assert_array_equal(got, want)


def test_header_only_stream():
    data = fmt.pack_header(fmt.StreamDesc(5, 4, 4)) + fmt.TRAILER
    got, _ = decode_pipeline.decode(data)
    want, _ = oracle.decode(data)
    np.testing.assert_array_equal(got, want)


def _raw_stream(w, h, ch, body: bytes) -> bytes:
    return fmt.pack_header(fmt.StreamDesc(w, h, ch)) + body + fmt.TRAILER


def test_noncanonical_index_to_unwritten_slot():
    """INDEX ops into slots the decoder never wrote read the zero entry
    (0,0,0,0) — legal streams no encoder produces (reference qoi.h:559)."""
    body = bytes([fmt.OP_INDEX | 5, fmt.OP_INDEX | 0, fmt.OP_INDEX | 63,
                  fmt.OP_RGB, 9, 9, 9])
    data = _raw_stream(4, 1, 4, body)
    got, _ = decode_pipeline.decode(data)
    want, _ = oracle.decode(data)
    np.testing.assert_array_equal(got, want)


def test_noncanonical_redundant_literals():
    """RGB literals where a canonical encoder would emit DIFF/RUN."""
    body = bytes([fmt.OP_RGB, 10, 10, 10] * 4 + [fmt.OP_RUN | 2])
    data = _raw_stream(7, 1, 3, body)
    got, _ = decode_pipeline.decode(data)
    want, _ = oracle.decode(data)
    np.testing.assert_array_equal(got, want)


def test_noncanonical_index_after_alpha_pull():
    """Alpha pulled through INDEX then used by an RGB literal's hash: the
    fixpoint loop must iterate past the optimistic guess."""
    # px1 = RGBA(1,2,3,77)  -> slot h1; px2 = RGB(9,9,9) alpha 77
    # px3 = INDEX back to px1; px4 = RGB(20,20,20) (alpha 77 via pull)
    h1 = fmt.hash_rgba(1, 2, 3, 77)
    body = bytes([fmt.OP_RGBA, 1, 2, 3, 77, fmt.OP_RGB, 9, 9, 9,
                  fmt.OP_INDEX | h1, fmt.OP_RGB, 20, 20, 20,
                  fmt.OP_INDEX | fmt.hash_rgba(20, 20, 20, 77)])
    data = _raw_stream(5, 1, 4, body)
    got, _ = decode_pipeline.decode(data)
    want, _ = oracle.decode(data)
    np.testing.assert_array_equal(got, want)


def test_random_roundtrips_many_sizes():
    rng = np.random.default_rng(0)
    for _ in range(6):
        w = int(rng.integers(1, 90))
        h = int(rng.integers(1, 40))
        ch = int(rng.choice([3, 4]))
        kind = int(rng.integers(0, 3))
        if kind == 0:
            img = testimages.noise(w, h, ch, seed=int(rng.integers(1 << 30)))
        elif kind == 1:
            img = testimages.palette(w, h, ch, seed=int(rng.integers(1 << 30)))
        else:
            img = testimages.gradient(w, h, ch)
        _roundtrip(img)
