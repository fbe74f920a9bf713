"""Sharded single-stream decode vs the oracle on a virtual 8-device mesh.

Every decoder carry crosses shard boundaries here: chunks straddling byte
boundaries, INDEX ops reaching into earlier shards' table state, DIFF/LUMA
chains crossing shards, runs spanning shards, and the alpha-hash fixpoint
ranging over the whole stream."""
import numpy as np
import pytest

import qoi_tpu.format as fmt
from qoi_tpu import oracle
from qoi_tpu.parallel import sharding, tiled_decode
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
    stream = oracle.encode(img, fmt.StreamDesc(w, h, ch))
    got, gdesc = tiled_decode.decode_tiled(stream, mesh)
    want, wdesc = oracle.decode(stream)
    assert gdesc == wdesc
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("name", sorted(testimages.edge_case_suite(4)))
def test_tiled_decode_edge_cases_rgba(name):
    _check(testimages.edge_case_suite(4)[name], _mesh())


@pytest.mark.parametrize("name", ["gradient", "palette", "mixed", "noise_small"])
def test_tiled_decode_edge_cases_rgb(name):
    _check(testimages.edge_case_suite(3)[name], _mesh())


def test_index_reaching_across_shards():
    """Palette colors established early, INDEXed much later: targets land
    in earlier shards and resolve through incoming-table symbols."""
    _check(testimages.palette(400, 5, 4, colors=10, seed=6), _mesh())


def test_diff_chains_crossing_shards():
    """A smooth gradient is one long DIFF/LUMA chain: every shard's values
    depend additively on the incoming pixel symbol."""
    _check(testimages.gradient(300, 7, 3), _mesh())


def test_runs_spanning_shards():
    _check(testimages.flat(500, 4, 4), _mesh())


def test_alpha_pull_fixpoint_across_shards():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, size=(6, 120, 4), dtype=np.uint8)
    img[..., 3] = 190
    img[0, 0, 3] = 120
    _check(img, _mesh())


def test_channel_forcing_tiled():
    img = testimages.mixed(60, 30, 4)
    stream = oracle.encode(img, fmt.StreamDesc(60, 30, 4))
    mesh = _mesh()
    for ch in (0, 3, 4):
        got, _ = tiled_decode.decode_tiled(stream, mesh, ch)
        want, _ = oracle.decode(stream, ch)
        np.testing.assert_array_equal(got, want)


def test_truncated_stream_tiled():
    img = testimages.mixed(40, 20, 4)
    full = oracle.encode(img, fmt.StreamDesc(40, 20, 4))
    cut = full[: fmt.HEADER_SIZE + 30] + fmt.TRAILER
    got, _ = tiled_decode.decode_tiled(cut, _mesh())
    want, _ = oracle.decode(cut)
    np.testing.assert_array_equal(got, want)
