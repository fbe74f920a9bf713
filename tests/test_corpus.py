"""Corpus job: sharding, aggregate metrics, checkpoint/resume (SURVEY §5.4)."""
import json

import pytest

from qoi_tpu import corpus, io as qio, oracle
from qoi_tpu.utils import testimages

pytestmark = pytest.mark.skipif(not oracle.available(), reason="oracle not built")


@pytest.fixture()
def small_corpus(tmp_path):
    imgs = [
        testimages.noise(20, 12, 4, seed=1),
        testimages.gradient(24, 16, 3),
        testimages.palette(16, 16, 4, seed=2),
        testimages.mixed(18, 14, 3),
    ]
    for i, im in enumerate(imgs):
        qio.save_png(tmp_path / f"img{i}.png", im)
    return tmp_path, imgs


def test_job_counts_and_verifies(small_corpus):
    root, imgs = small_corpus
    c = corpus.run_job(root, "roundtrip", progress=lambda m: None)
    assert c.images == len(imgs)
    assert c.pixels == sum(im.shape[0] * im.shape[1] for im in imgs)
    assert c.verify_failures == 0
    s = c.summary()
    assert s["encode_mpps"] > 0 and s["decode_mpps"] > 0


def test_sharding_partitions_files(small_corpus):
    root, imgs = small_corpus
    c0 = corpus.run_job(root, "encode", shard=0, num_shards=2,
                        progress=lambda m: None)
    c1 = corpus.run_job(root, "encode", shard=1, num_shards=2,
                        progress=lambda m: None)
    assert c0.images + c1.images == len(imgs)
    assert c0.images == 2 and c1.images == 2


def test_checkpoint_resume(small_corpus, tmp_path):
    root, imgs = small_corpus
    ck = tmp_path / "job.json"

    # simulate a crash: checkpoint after every image, abort after the 2nd
    class Crash(Exception):
        pass

    def crashing_progress(msg):
        if msg.startswith("checkpoint @ 2/"):
            raise Crash

    with pytest.raises(Crash):
        corpus.run_job(root, "encode", checkpoint_path=ck,
                       checkpoint_every=1, progress=crashing_progress)
    assert json.loads(ck.read_text())["cursor"] == 2

    resumed = corpus.run_job(root, "encode", checkpoint_path=ck,
                             progress=lambda m: None)
    assert resumed.images == len(imgs)  # counters carried + remaining files
    assert json.loads(ck.read_text())["cursor"] == len(imgs)


def test_checkpoint_shard_mismatch_rejected(small_corpus, tmp_path):
    root, _ = small_corpus
    ck = tmp_path / "job.json"
    corpus.run_job(root, "encode", checkpoint_path=ck, shard=0, num_shards=2,
                   progress=lambda m: None)
    with pytest.raises(ValueError):
        corpus.run_job(root, "encode", checkpoint_path=ck, shard=1,
                       num_shards=2, progress=lambda m: None)
