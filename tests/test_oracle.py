"""C++ oracle codec sanity: roundtrips, structural stream checks, and the
probed reference behaviours from SURVEY.md §2.2-§2.3.

(The oracle itself was validated byte-for-byte against a compiled
/root/reference/qoi.h across 218 differential cases during development;
these tests guard against regressions without needing the reference binary.)
"""
import numpy as np
import pytest

from qoi_tpu import format as fmt
from qoi_tpu import oracle
from qoi_tpu.utils import testimages


pytestmark = pytest.mark.skipif(not oracle.available(), reason="no C++ toolchain")


@pytest.mark.parametrize("ch", [3, 4])
def test_roundtrip_edge_cases(ch):
    for name, img in testimages.edge_case_suite(ch).items():
        h, w = img.shape[:2]
        desc = fmt.StreamDesc(w, h, ch)
        stream = oracle.encode(img, desc)
        assert stream[:4] == b"qoif", name
        assert stream[-8:] == fmt.TRAILER, name
        back, back_desc = oracle.decode(stream)
        assert back_desc.width == w and back_desc.height == h, name
        assert np.array_equal(back, img), name


def test_known_stream_bytes():
    # Hand-computed stream: 3 pixels RGB = [(0,0,0), (0,0,0), (1,2,3)].
    # Pixel 0 == seed (0,0,0,255)? No: RGB mode keeps a=255 so pixel (0,0,0)
    # equals the seed -> starts a run. Pixel 1 continues it. Pixel 2 flushes
    # RUN(2) then encodes (1,2,3): deltas (+1,+2,+3) exceed DIFF range
    # (dg=+2 > 1) -> LUMA: vg=2, vg_r=-1, vg_b=1.
    img = np.array([[[0, 0, 0], [0, 0, 0], [1, 2, 3]]], dtype=np.uint8)
    stream = oracle.encode(img, fmt.StreamDesc(3, 1, 3))
    body = stream[fmt.HEADER_SIZE:-fmt.TRAILER_SIZE]
    assert body[0] == fmt.OP_RUN | (2 - 1)
    assert body[1] == fmt.OP_LUMA | (2 + 32)
    assert body[2] == ((-1 + 8) << 4) | (1 + 8)
    assert len(body) == 3


def test_run_cap_62():
    # 70 identical non-seed pixels: pixel 0 is a literal, the other 69 run
    # as RUN(62) + RUN(7). (For seed-valued pixels all 70 join the run:
    # RUN(62) + RUN(8), the SURVEY §2.2 probe.)
    img = np.full((1, 70, 3), 9, dtype=np.uint8)
    stream = oracle.encode(img, fmt.StreamDesc(70, 1, 3))
    body = stream[fmt.HEADER_SIZE:-fmt.TRAILER_SIZE]
    assert body[-2] == fmt.OP_RUN | (62 - 1)
    assert body[-1] == fmt.OP_RUN | (7 - 1)
    seed_img = np.zeros((1, 70, 4), dtype=np.uint8)
    seed_img[..., 3] = 255
    stream = oracle.encode(seed_img, fmt.StreamDesc(70, 1, 4))
    assert stream[fmt.HEADER_SIZE:-fmt.TRAILER_SIZE] == bytes([0xFD, 0xC7])


def test_wraparound_diff():
    # seed black -> 255,255,255 is DIFF(-1,-1,-1) = 0x55; back to 0 is
    # DIFF(+1,+1,+1) = 0x7f (SURVEY §2.2 probed).
    img = np.array([[[255, 255, 255], [0, 0, 0]]], dtype=np.uint8)
    stream = oracle.encode(img, fmt.StreamDesc(2, 1, 3))
    body = stream[fmt.HEADER_SIZE:-fmt.TRAILER_SIZE]
    assert body[0] == 0x55
    assert body[1] == 0x7F


def test_zero_alpha_pixel_hits_zeroed_table():
    # First pixel (0,0,0,0): table slot 0 is zero-initialised and equal ->
    # INDEX|0 even though nothing was ever stored (SURVEY §2.2 property).
    img = np.zeros((1, 1, 4), dtype=np.uint8)
    stream = oracle.encode(img, fmt.StreamDesc(1, 1, 4))
    body = stream[fmt.HEADER_SIZE:-fmt.TRAILER_SIZE]
    assert body == bytes([fmt.OP_INDEX | 0])


def test_channel_forcing():
    img = testimages.gradient(20, 10, 3)
    stream = oracle.encode(img, fmt.StreamDesc(20, 10, 3))
    forced, desc = oracle.decode(stream, channels=4)
    assert desc.channels == 3  # desc reports header values (probed)
    assert forced.shape == (10, 20, 4)
    assert np.array_equal(forced[..., :3], img)
    assert np.all(forced[..., 3] == 255)
    back3, _ = oracle.decode(stream, channels=3)
    assert np.array_equal(back3, img)


def test_truncation_tolerance():
    # Truncated chunk data decodes successfully, repeating the current pixel
    # (reference qoi.h:544 guard; SURVEY §2.3.4 probe).
    img = testimages.noise(32, 32, 4)
    stream = oracle.encode(img, fmt.StreamDesc(32, 32, 4))
    trunc = stream[:40] + fmt.TRAILER
    back, desc = oracle.decode(trunc)
    assert back.shape == (32, 32, 4)
    assert desc.width == 32


def test_decode_rejects_bad_streams():
    with pytest.raises(ValueError):
        oracle.decode(b"definitely-not-qoi-data-here-x")
    img = testimages.noise(8, 8, 3)
    stream = bytearray(oracle.encode(img, fmt.StreamDesc(8, 8, 3)))
    stream[0] = ord("x")  # corrupt magic
    with pytest.raises(ValueError):
        oracle.decode(bytes(stream))
