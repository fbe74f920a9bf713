"""Cross-mode end-to-end roundtrips: every encode mode x every decode mode
agrees with the oracle and with each other (the full engine matrix)."""
import numpy as np
import pytest

import qoi_tpu.format as fmt
from qoi_tpu import oracle
from qoi_tpu.models import (batch, decode_pipeline, decode_v2, decode_v3,
                            pipeline, scan_codec, streamed)
from qoi_tpu.parallel import sharding, tiled, tiled_decode
from qoi_tpu.utils import testimages

pytestmark = [
    pytest.mark.skipif(not oracle.available(), reason="oracle not built"),
    pytest.mark.slow,  # quick tier: -m "not slow"
]


def _mesh():
    import jax

    return sharding.make_mesh(data=1, seq=min(len(jax.devices()), 8))


@pytest.mark.parametrize("ch", [3, 4])
def test_engine_matrix(ch):
    img = testimages.mixed(90, 60, ch)
    desc = fmt.StreamDesc(90, 60, ch)
    ref_stream = oracle.encode(img, desc)
    mesh = _mesh()

    encoders = {
        "pipeline": lambda: pipeline.encode(img, desc),
        "scan": lambda: scan_codec.encode(img, desc),
        "streamed": lambda: streamed.encode(img, desc, tile_px=1024),
        "tiled": lambda: tiled.encode_tiled(img, desc, mesh),
        "batch": lambda: batch.encode_batch([img], [desc])[0],
    }
    for name, enc in encoders.items():
        assert enc() == ref_stream, f"encoder {name} diverges"

    ref_px, _ = oracle.decode(ref_stream)
    decoders = {
        "v3": lambda: decode_v3.decode(ref_stream)[0],
        "v2": lambda: decode_v2.decode(ref_stream)[0],
        "v1": lambda: decode_pipeline.decode(ref_stream)[0],
        "scan": lambda: scan_codec.decode(ref_stream)[0],
        "tiled": lambda: tiled_decode.decode_tiled(ref_stream, mesh)[0],
        "batch": lambda: batch.decode_batch([ref_stream])[0][0],
    }
    for name, dec in decoders.items():
        np.testing.assert_array_equal(dec(), ref_px, err_msg=f"decoder {name}")


def test_tiled_encode_feeds_tiled_decode():
    """Sequence-parallel encode output decodes sequence-parallel."""
    mesh = _mesh()
    img = testimages.palette(120, 40, 4, colors=11, seed=21)
    desc = fmt.StreamDesc(120, 40, 4)
    stream = tiled.encode_tiled(img, desc, mesh)
    out, _ = tiled_decode.decode_tiled(stream, mesh)
    np.testing.assert_array_equal(out, img)
