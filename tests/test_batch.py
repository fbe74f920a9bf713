"""Batched encode/decode vs the oracle: mixed shapes, mixed channels,
per-image failure isolation (SURVEY §5.3)."""
import numpy as np
import pytest

import qoi_tpu.format as fmt
from qoi_tpu import oracle
from qoi_tpu.models import batch
from qoi_tpu.utils import testimages

pytestmark = [
    pytest.mark.skipif(not oracle.available(), reason="oracle not built"),
    pytest.mark.slow,  # quick tier: -m "not slow"
]


def _mixed_images():
    return [
        testimages.noise(17, 13, 4, seed=1),
        testimages.gradient(64, 32, 3),
        testimages.flat(62, 1, 4),
        testimages.palette(33, 21, 4, seed=2),
        testimages.mixed(40, 40, 3),
    ]


def test_encode_batch_matches_oracle():
    imgs = _mixed_images()
    streams = batch.encode_batch(imgs)
    for img, s in zip(imgs, streams):
        h, w, ch = img.shape
        assert s == oracle.encode(img, fmt.StreamDesc(w, h, ch))


def test_decode_batch_roundtrip():
    imgs = _mixed_images()
    streams = [
        oracle.encode(im, fmt.StreamDesc(im.shape[1], im.shape[0], im.shape[2]))
        for im in imgs
    ]
    results = batch.decode_batch(streams)
    for img, (out, desc, err) in zip(imgs, results):
        assert err is None
        np.testing.assert_array_equal(out, img)


def test_decode_batch_isolates_bad_streams():
    good = testimages.gradient(20, 10, 4)
    stream = oracle.encode(good, fmt.StreamDesc(20, 10, 4))
    bad = b"nope" + stream[4:]
    results = batch.decode_batch([stream, bad, b"short", stream])
    assert results[0][2] is None and results[3][2] is None
    np.testing.assert_array_equal(results[0][0], good)
    np.testing.assert_array_equal(results[3][0], good)
    assert results[1][0] is None and results[1][2] is not None
    assert results[2][0] is None and results[2][2] is not None


def test_decode_batch_noncanonical_in_group():
    """A hand-crafted non-canonical stream rides in a batch next to
    canonical ones; everything still matches the oracle."""
    good = testimages.gradient(16, 4, 4)
    s1 = oracle.encode(good, fmt.StreamDesc(16, 4, 4))
    body = bytes([fmt.OP_INDEX | 5, fmt.OP_INDEX | 0, fmt.OP_RGB, 9, 9, 9,
                  fmt.OP_RUN | 2] + [fmt.OP_RGBA, 1, 2, 3, 77] * 19)
    s2 = fmt.pack_header(fmt.StreamDesc(9, 7, 4)) + body + fmt.TRAILER
    for (out, desc, err), stream in zip(batch.decode_batch([s1, s2]), [s1, s2]):
        assert err is None
        want, _ = oracle.decode(stream)
        np.testing.assert_array_equal(out, want)


def test_decode_batch_channel_forcing():
    img = testimages.mixed(30, 20, 4)
    stream = oracle.encode(img, fmt.StreamDesc(30, 20, 4))
    (out, desc, err), = batch.decode_batch([stream], channels=3)
    want, _ = oracle.decode(stream, 3)
    np.testing.assert_array_equal(out, want)
