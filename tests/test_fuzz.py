"""Differential fuzzing: decoder robustness on arbitrary bytes.

Mirrors the reference fuzz harness shape (qoifuzz.c:20-32: arbitrary input
bytes + an attacker-controlled channels int into qoi_decode) but checks more
than absence-of-crash: every accepted stream must decode pixel-identically
to the C++ oracle, and every rejection must match the oracle's rejection
(reference validation, qoi.h:497-521)."""
import struct

import numpy as np
import pytest

import qoi_tpu.format as fmt
from qoi_tpu import oracle
from qoi_tpu.models import decode_pipeline, scan_codec

pytestmark = [
    pytest.mark.skipif(not oracle.available(), reason="oracle not built"),
    pytest.mark.slow,  # quick tier: -m "not slow"
]


def _oracle_try(data: bytes, channels: int):
    try:
        return oracle.decode(data, channels)
    except ValueError:
        return None


def _ours_try(data: bytes, channels: int):
    try:
        return decode_pipeline.decode(data, channels)
    except ValueError:
        return None


def _check(data: bytes, channels: int = 0):
    try:
        if fmt.unpack_header(data).num_pixels > 100_000:
            return  # valid but huge dims: correct on both sides, too big for CI
    except ValueError:
        pass
    want = _oracle_try(data, channels)
    got = _ours_try(data, channels)
    if want is None:
        assert got is None, "accepted a stream the reference rejects"
        return
    assert got is not None, "rejected a stream the reference accepts"
    np.testing.assert_array_equal(got[0], want[0])
    assert got[1] == want[1]


def _header(w, h, ch, cs) -> bytes:
    return b"qoif" + struct.pack(">IIBB", w, h, ch, cs)


def test_fuzz_random_bytes():
    rng = np.random.default_rng(0)
    for _ in range(40):
        n = int(rng.integers(0, 200))
        _check(rng.integers(0, 256, n, dtype=np.uint8).tobytes(),
               int(rng.integers(0, 5)) if rng.integers(2) else 0)


def test_fuzz_valid_header_random_body():
    rng = np.random.default_rng(1)
    for _ in range(30):
        w = int(rng.integers(1, 40))
        h = int(rng.integers(1, 20))
        ch = int(rng.choice([3, 4]))
        body = rng.integers(0, 256, int(rng.integers(0, 300)),
                            dtype=np.uint8).tobytes()
        _check(_header(w, h, ch, 0) + body + fmt.TRAILER)


def test_fuzz_mutated_canonical_streams():
    rng = np.random.default_rng(2)
    from qoi_tpu.utils import testimages

    img = testimages.mixed(24, 18, 4)
    base = bytearray(oracle.encode(img, fmt.StreamDesc(24, 18, 4)))
    for _ in range(30):
        data = bytearray(base)
        for _ in range(int(rng.integers(1, 6))):
            data[int(rng.integers(0, len(data)))] = int(rng.integers(0, 256))
        _check(bytes(data))


def test_rejects_bad_headers():
    cases = [
        b"",
        b"qoif",
        _header(0, 10, 4, 0) + fmt.TRAILER,          # zero width
        _header(10, 0, 4, 0) + fmt.TRAILER,          # zero height
        _header(10, 10, 2, 0) + fmt.TRAILER,         # bad channels
        _header(10, 10, 4, 2) + fmt.TRAILER,         # bad colorspace
        b"QOIF" + _header(4, 4, 4, 0)[4:] + fmt.TRAILER,  # bad magic
        _header(65536, 65536, 4, 0) + fmt.TRAILER,   # pixel cap (qoi.h:332)
    ]
    for data in cases:
        _check(data)


def test_fuzz_channels_argument():
    """The reference fuzzer feeds a raw int as channels; our API validates
    it up front (qoi.h:497-503 is the reference's net)."""
    img_stream = oracle.encode(
        np.zeros((4, 4, 4), np.uint8), fmt.StreamDesc(4, 4, 4))
    for bad in (-1, 1, 2, 5, 255):
        with pytest.raises(ValueError):
            decode_pipeline.decode(img_stream, bad)
        with pytest.raises(ValueError):
            scan_codec.decode(img_stream, bad)


def test_property_roundtrip_random():
    """decode(encode(x)) == x for random x across engines (SURVEY §4)."""
    rng = np.random.default_rng(3)
    from qoi_tpu.models import pipeline

    for _ in range(5):
        w = int(rng.integers(1, 50))
        h = int(rng.integers(1, 30))
        ch = int(rng.choice([3, 4]))
        img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        desc = fmt.StreamDesc(w, h, ch)
        stream = pipeline.encode(img, desc)
        assert stream == oracle.encode(img, desc)  # encode determinism
        out, _ = decode_pipeline.decode(stream)
        np.testing.assert_array_equal(out, img)
