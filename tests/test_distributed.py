"""Multi-host execution path, exercised for real: two OS processes bring
up `jax.distributed` over the CPU backend, run disjoint corpus shards,
and allreduce their counters (SURVEY §5.8, BASELINE config 5). The test
fails if the DCN-facing path (init_distributed / allreduce_counters)
regresses.

Runs in subprocesses because a jax.distributed runtime cannot coexist
with the test session's own JAX backend. The driver uses the
`corpus.main` CLI path (--coordinator) end to end.
"""
import json
import pathlib
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

_DRIVER = textwrap.dedent("""
    import json, sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")

    from qoi_tpu import corpus

    coordinator, pid = sys.argv[1], int(sys.argv[2])
    corpus.init_distributed(coordinator, 2, pid)
    assert jax.process_count() == 2, jax.process_count()

    counters = corpus.run_job(
        {root!r}, mode="roundtrip",
        shard=jax.process_index(), num_shards=jax.process_count(),
        progress=lambda m: None)
    total = corpus.allreduce_counters(counters)
    print("RESULT " + json.dumps(
        {{"local_images": counters.images, **total.summary()}}))
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_allreduce(tmp_path):
    from qoi_tpu import io as qio
    from qoi_tpu.utils import testimages

    root = tmp_path / "corpus"
    root.mkdir()
    sizes = [(20, 15), (33, 9), (16, 16), (40, 7), (8, 8)]
    n_px = 0
    for i, (w, h) in enumerate(sizes):
        qio.save_png(root / f"img{i}.png", testimages.mixed(w, h, 4, seed=i))
        n_px += w * h

    driver = tmp_path / "driver.py"
    driver.write_text(_DRIVER.format(repo=str(REPO), root=str(root)))
    coordinator = f"127.0.0.1:{_free_port()}"

    procs = [
        subprocess.Popen(
            [sys.executable, str(driver), coordinator, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed subprocess timed out")
        assert p.returncode == 0, f"rc={p.returncode}\n{err[-2000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert line, f"no RESULT line:\n{out}\n{err[-2000:]}"
        outs.append(json.loads(line[-1][len("RESULT "):]))

    # shards are disjoint and cover all files; the allreduced totals must
    # agree across processes and equal the whole corpus
    assert outs[0]["local_images"] + outs[1]["local_images"] == len(sizes)
    assert all(o["local_images"] > 0 for o in outs)
    for o in outs:
        assert o["images"] == len(sizes)
        assert o["mpixels"] == pytest.approx(n_px / 1e6)
        assert o["verify_failures"] == 0
