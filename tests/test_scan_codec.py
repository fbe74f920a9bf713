"""Differential tests: JAX scan anchor codec vs the C++ oracle.

Encode must be byte-identical, decode pixel-identical (SURVEY.md §4
golden/differential strategy).
"""
import numpy as np
import pytest

from qoi_tpu import format as fmt
from qoi_tpu import oracle
from qoi_tpu.models import scan_codec
from qoi_tpu.utils import testimages

pytestmark = pytest.mark.skipif(not oracle.available(), reason="no C++ toolchain")


@pytest.mark.parametrize("ch", [3, 4])
def test_encode_matches_oracle(ch):
    for name, img in testimages.edge_case_suite(ch).items():
        h, w = img.shape[:2]
        desc = fmt.StreamDesc(w, h, ch)
        expect = oracle.encode(img, desc)
        got = scan_codec.encode(img, desc)
        assert got == expect, f"{name}: {len(got)} vs {len(expect)} bytes"


@pytest.mark.parametrize("ch", [3, 4])
def test_decode_matches_oracle(ch):
    for name, img in testimages.edge_case_suite(ch).items():
        h, w = img.shape[:2]
        stream = oracle.encode(img, fmt.StreamDesc(w, h, ch))
        got, desc = scan_codec.decode(stream)
        assert np.array_equal(got, img), name
        assert desc.width == w and desc.height == h


def test_decode_channel_forcing():
    img = testimages.gradient(24, 9, 3)
    stream = oracle.encode(img, fmt.StreamDesc(24, 9, 3))
    forced, _ = scan_codec.decode(stream, channels=4)
    expect, _ = oracle.decode(stream, channels=4)
    assert np.array_equal(forced, expect)


def test_decode_truncation_parity():
    img = testimages.noise(16, 16, 4)
    stream = oracle.encode(img, fmt.StreamDesc(16, 16, 4))
    trunc = stream[:30] + fmt.TRAILER
    got, _ = scan_codec.decode(trunc)
    expect, _ = oracle.decode(trunc)
    assert np.array_equal(got, expect)


def test_random_streams_roundtrip():
    rng = np.random.default_rng(7)
    for _ in range(5):
        w, h = int(rng.integers(1, 40)), int(rng.integers(1, 20))
        ch = int(rng.choice([3, 4]))
        img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        desc = fmt.StreamDesc(w, h, ch)
        assert scan_codec.encode(img, desc) == oracle.encode(img, desc)
        back, _ = scan_codec.decode(oracle.encode(img, desc))
        assert np.array_equal(back, img)
