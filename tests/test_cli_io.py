"""IO layer + converter CLI + bench harness smoke tests (reference L2/L3
parity: qoi.h:592-648, qoiconv.c, qoibench.c)."""
import numpy as np
import pytest

import qoi_tpu
import qoi_tpu.format as fmt
from qoi_tpu import cli, io as qio, oracle
from qoi_tpu.utils import testimages

pytestmark = pytest.mark.skipif(not oracle.available(), reason="oracle not built")


def test_write_read_qoi(tmp_path):
    img = testimages.mixed(64, 48, 4)
    desc = qio.image_desc(img)
    p = tmp_path / "x.qoi"
    n = qio.write(p, img, desc, engine="tpu")
    assert n == len(oracle.encode(img, desc))
    back, d2 = qio.read(p, engine="tpu")
    assert (d2.width, d2.height, d2.channels) == (64, 48, 4)
    np.testing.assert_array_equal(back, img)


def test_config_table_block_threads_through():
    """EngineConfig.table_block drives ops/table.py's block width: a
    non-default width must still be byte-identical to the oracle."""
    from qoi_tpu.config import EngineConfig
    from qoi_tpu.models import pipeline

    img = testimages.mixed(56, 40, 4, seed=5)
    desc = qio.image_desc(img)
    cfg = EngineConfig(table_block=32)
    assert pipeline.encode(img, desc, config=cfg) == oracle.encode(img, desc)


def test_config_stream_tile_px_threads_through():
    """EngineConfig.stream_tile_px drives the streamed drivers' tile
    size: a tiny tile forces multi-tile chaining on a small image and
    must stay byte-/pixel-exact."""
    from qoi_tpu.config import EngineConfig
    from qoi_tpu.models import streamed

    img = testimages.mixed(64, 48, 4, seed=6)
    desc = qio.image_desc(img)
    cfg = EngineConfig(stream_tile_px=1024)
    stream = streamed.encode(img, desc, config=cfg)
    assert stream == oracle.encode(img, desc)
    back, _ = streamed.decode(stream, config=cfg)
    np.testing.assert_array_equal(back, img)


def test_config_mesh_drives_tiled_io(tmp_path):
    """EngineConfig.mesh routes io.write/io.read through the sequence-
    parallel tiled codec over a real (data, seq) device mesh."""
    from qoi_tpu.config import EngineConfig

    img = testimages.mixed(48, 32, 4, seed=7)
    desc = qio.image_desc(img)
    cfg = EngineConfig(mesh=(1, 4))
    p = tmp_path / "m.qoi"
    n = qio.write(p, img, desc, engine=cfg)
    assert n == len(oracle.encode(img, desc))
    back, d2 = qio.read(p, engine=cfg)
    np.testing.assert_array_equal(back, img)
    assert (d2.width, d2.height) == (48, 32)


def test_png_roundtrip(tmp_path):
    img = testimages.gradient(33, 21, 3)
    p = tmp_path / "x.png"
    qio.save_png(p, img)
    np.testing.assert_array_equal(qio.load_png(p), img)


def test_package_level_api():
    img = testimages.palette(40, 25, 4)
    stream = qoi_tpu.encode(img)
    assert stream == oracle.encode(img, qio.image_desc(img))
    back, desc = qoi_tpu.decode(stream)
    np.testing.assert_array_equal(back, img)
    assert desc.channels == 4


def test_cli_png_to_qoi_to_png(tmp_path):
    img = testimages.mixed(50, 40, 3)
    src = tmp_path / "a.png"
    mid = tmp_path / "a.qoi"
    out = tmp_path / "b.png"
    qio.save_png(src, img)
    assert cli.main([str(src), str(mid), "--verify"]) == 0
    assert mid.read_bytes() == oracle.encode(img, qio.image_desc(img))
    assert cli.main([str(mid), str(out), "--verify"]) == 0
    np.testing.assert_array_equal(qio.load_png(out), img)


def test_cli_rejects_unknown_suffix(tmp_path):
    with pytest.raises(SystemExit):
        cli.main([str(tmp_path / "a.bmp"), str(tmp_path / "b.qoi")])


def test_bench_synthetic_runs(capsys):
    from qoi_tpu import bench

    rc = bench.main(["1", "--synthetic", "small", "--onlytotals", "--nopng", "--json"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Grand total" in out
    assert "qoi-tpu" in out


def test_bench_directory(tmp_path, capsys):
    from qoi_tpu import bench

    qio.save_png(tmp_path / "one.png", testimages.noise(20, 15, 4, seed=1))
    sub = tmp_path / "sub"
    sub.mkdir()
    qio.save_png(sub / "two.png", testimages.gradient(16, 16, 3))
    rc = bench.main(["1", str(tmp_path), "--onlytotals", "--nopng"])
    assert rc == 0
    assert "2 images" in capsys.readouterr().out
