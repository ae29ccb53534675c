"""Streaming consumer (S5 parity): checkpointed drain, idempotent
replay, restart resume, and the consume -> watch -> index loop."""

import glob
import hashlib
import os

import pytest
import ray

from cb import resumable, streaming


def _msgs(start, n, partition):
    return [
        {
            "doc_id": partition * 100000 + start + i,
            "text": f"stream message {partition} {start + i} alpha beta join",
        }
        for i in range(n)
    ]


def _sha(path):
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


@pytest.fixture()
def buffer():
    buf = streaming.StreamBuffer.remote(num_partitions=2)
    yield buf
    ray.kill(buf)


def test_consume_checkpoints_and_resumes(buffer, tmp_path):
    out = str(tmp_path / "out")
    ray.get(buffer.push.remote(0, _msgs(0, 30, 0)))
    ray.get(buffer.push.remote(1, _msgs(0, 25, 1)))
    c = streaming.StreamConsumer(buffer, out, batch_max=16)
    assert c.tick() == 55
    files1 = sorted(glob.glob(os.path.join(out, "*.parquet")))
    assert files1  # bounded batches -> multiple shards per partition
    assert c.tick() == 0  # quiet tick consumes nothing

    # more arrives; a NEW consumer (restart) resumes from checkpoints
    ray.get(buffer.push.remote(0, _msgs(30, 10, 0)))
    c2 = streaming.StreamConsumer(buffer, out, batch_max=16)
    mtimes = {f: os.stat(f).st_mtime_ns for f in files1}
    assert c2.tick() == 10
    for f, mt in mtimes.items():
        assert os.stat(f).st_mtime_ns == mt, "old shard rewritten on resume"

    import pyarrow.parquet as pq

    total = sum(
        pq.read_table(f).num_rows for f in glob.glob(os.path.join(out, "*.parquet"))
    )
    assert total == 65


def test_replay_after_lost_checkpoint_is_idempotent(buffer, tmp_path):
    out = str(tmp_path / "out")
    ray.get(buffer.push.remote(0, _msgs(0, 20, 0)))
    c = streaming.StreamConsumer(buffer, out, batch_max=64)
    c.tick()
    shard = glob.glob(os.path.join(out, "part=0-*.parquet"))[0]
    ref = _sha(shard)
    # crash between shard write and checkpoint advance: ckpt lost
    os.remove(os.path.join(out, "_checkpoints", "p0.json"))
    c2 = streaming.StreamConsumer(buffer, out, batch_max=64)
    assert c2.tick() == 20  # re-consumes the same range
    assert _sha(shard) == ref  # byte-identical overwrite


def test_replay_with_new_arrivals_does_not_duplicate(buffer, tmp_path):
    """Crash before checkpoint + NEW messages arriving before restart:
    the replay polls a larger range — the stale uncommitted shard must
    be cleared, not left overlapping (code-review finding, round 2)."""
    import pyarrow.parquet as pq

    out = str(tmp_path / "out")
    ray.get(buffer.push.remote(0, _msgs(0, 20, 0)))
    c = streaming.StreamConsumer(buffer, out, batch_max=64)
    c.tick()
    # crash between shard write and checkpoint: ckpt lost, shard stays
    os.remove(os.path.join(out, "_checkpoints", "p0.json"))
    ray.get(buffer.push.remote(0, _msgs(20, 10, 0)))  # arrivals pre-restart
    c2 = streaming.StreamConsumer(buffer, out, batch_max=64)
    assert c2.tick() == 30
    files = sorted(glob.glob(os.path.join(out, "part=0-*.parquet")))
    total = sum(pq.read_table(f).num_rows for f in files)
    ids = [
        i for f in files for i in pq.read_table(f)["doc_id"].to_pylist()
    ]
    assert total == 30 and len(set(ids)) == 30  # no duplicated rows


def test_consume_then_watch_indexes_stream(buffer, tmp_path):
    """The full loop: push -> consume -> watch re-indexes the shard dir
    incrementally; final index equals a fresh build over everything."""
    out = str(tmp_path / "out")
    idx = str(tmp_path / "idx")
    c = streaming.StreamConsumer(buffer, out, batch_max=64)
    ray.get(buffer.push.remote(0, _msgs(0, 40, 0)))
    seen = []

    def grow(_):
        if len(seen) == 1:
            ray.get(buffer.push.remote(1, _msgs(0, 30, 1)))
            c.tick()

    def record(tick, meta):
        seen.append(meta.n_docs if meta else 0)

    c.tick()
    resumable.watch(
        out, idx, max_ticks=2, sleep_fn=grow, on_tick=record,
        text_col="text", id_col="doc_id", num_parts=4,
    )
    assert seen == [40, 70]

    fresh = str(tmp_path / "fresh")
    resumable.build_index_resumable(
        sorted(glob.glob(os.path.join(out, "*.parquet"))), fresh,
        text_col="text", id_col="doc_id", num_parts=4,
    )
    from cb.build import IndexMeta

    ma, mb = IndexMeta(idx), IndexMeta(fresh)
    assert (ma.n_docs, ma.total_tokens, ma.avgdl) == (mb.n_docs, mb.total_tokens, mb.avgdl)
