"""Header pack/unpack and descriptor validation (reference qoi.h:364-372,
qoi.h:497-521 rejection sets)."""
import pytest

from qoi_tpu import format as fmt


def test_header_roundtrip():
    desc = fmt.StreamDesc(1920, 1080, 4, fmt.SRGB)
    hdr = fmt.pack_header(desc)
    assert len(hdr) == fmt.HEADER_SIZE
    assert hdr[:4] == b"qoif"
    # width/height are big-endian (reference qoi.h:341-354)
    assert hdr[4:8] == (1920).to_bytes(4, "big")
    assert hdr[8:12] == (1080).to_bytes(4, "big")
    back = fmt.unpack_header(hdr + bytes(fmt.TRAILER_SIZE))
    assert back == desc


@pytest.mark.parametrize(
    "desc",
    [
        fmt.StreamDesc(0, 10, 3),
        fmt.StreamDesc(10, 0, 3),
        fmt.StreamDesc(10, 10, 2),
        fmt.StreamDesc(10, 10, 5),
        fmt.StreamDesc(10, 10, 3, 2),
        fmt.StreamDesc(25_000, 20_000, 3),  # 500 Mpx >= PIXELS_MAX
    ],
)
def test_invalid_descs_rejected(desc):
    with pytest.raises(ValueError):
        desc.validate()


def test_unpack_rejects_garbage():
    with pytest.raises(ValueError):
        fmt.unpack_header(b"nope" + bytes(40))
    with pytest.raises(ValueError):
        fmt.unpack_header(b"qoif")  # too short


def test_hash_function():
    # slot = (3r + 5g + 7b + 11a) mod 64 (reference qoi.h:92-94)
    assert fmt.hash_rgba(0, 0, 0, 0) == 0
    assert fmt.hash_rgba(0, 0, 0, 255) == (255 * 11) % 64
    assert fmt.hash_rgba(1, 1, 1, 1) == (3 + 5 + 7 + 11) % 64


def test_trailer():
    assert fmt.TRAILER == bytes([0, 0, 0, 0, 0, 0, 0, 1])


def test_pixel_cap_integer_division_parity():
    """The reference rejects height >= PIXELS_MAX / width with INTEGER
    division (qoi.h:369,518): w=3, h=133333333 has 399,999,999 pixels —
    below the product cap — yet must be rejected."""
    w, h = 3, 133_333_333
    assert w * h < fmt.PIXELS_MAX
    with pytest.raises(ValueError):
        fmt.StreamDesc(w, h, 4).validate()
    # one row fewer is accepted (399,999,996 px)
    fmt.StreamDesc(w, h - 1, 4).validate()
    # width=1 keeps the full cap: 399,999,999 rows accepted, 400M rejected
    fmt.StreamDesc(1, fmt.PIXELS_MAX - 1, 4).validate()
    with pytest.raises(ValueError):
        fmt.StreamDesc(1, fmt.PIXELS_MAX, 4).validate()


def test_pixel_cap_header_rejection_parity_with_oracle():
    """Near-cap header rejection must agree with the C++ oracle
    (header-validation only; no pixel allocation on the reject path)."""
    import struct

    from qoi_tpu import oracle

    if not oracle.available():
        pytest.skip("oracle unavailable")
    hdr = fmt.MAGIC + struct.pack(">IIBB", 3, 133_333_333, 4, 0)
    stream = hdr + fmt.TRAILER
    with pytest.raises(ValueError):
        fmt.unpack_header(stream)
    with pytest.raises(ValueError):
        oracle.decode(stream)  # oracle rejects the same header
