"""Streaming consumer: partitioned message stream -> checkpointed
parquet shards (S5 parity).

The reference's ``EventHubConsumer`` runs one processor per EventHub
partition, parses each message batch, pushes it, and advances a
checkpoint every minute (/root/reference/src/ConveyorBelt.Tooling/
EventHub/EventHubConsumer.cs:15-108).  The Ray-native analog:

- :class:`StreamBuffer` — a named actor standing in for the partitioned
  broker (push/poll by (partition, offset); a real deployment points
  the consumer at Kafka/EventHub instead — the consumer only needs
  ``poll(partition, offset, max_n)``).
- :class:`StreamConsumer` — drains each partition from its CHECKPOINTED
  offset, parses (registry parser or ``pa.Table.from_pylist``), appends
  one parquet shard per consumed range
  (``part=<p>-off=<start>-<end>.parquet``), then atomically advances
  the checkpoint — write-audit-publish, so a crash between shard write
  and checkpoint re-consumes the SAME range into the SAME deterministic
  file (idempotent, the reference's transactional offset advance).

Feeding the output dir to :func:`cb.resumable.watch` closes the loop:
push -> consume -> shards land -> incremental re-index, each stage
independently resumable.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray

from . import manifest


@ray.remote
class StreamBuffer:
    """Stand-in partitioned broker: per-partition append-only logs."""

    def __init__(self, num_partitions: int = 2):
        self.parts: list[list[dict]] = [[] for _ in range(num_partitions)]

    def push(self, partition: int, msgs: list[dict]) -> int:
        """Append messages; returns the partition's new high-water mark."""
        self.parts[partition].extend(msgs)
        return len(self.parts[partition])

    def poll(self, partition: int, offset: int, max_n: int = 1024) -> list[dict]:
        return self.parts[partition][offset : offset + max_n]

    def high_water(self, partition: int) -> int:
        return len(self.parts[partition])

    def num_partitions(self) -> int:
        return len(self.parts)


class StreamConsumer:
    """Checkpointed consumer over a StreamBuffer (or anything exposing
    ``poll``/``high_water``/``num_partitions`` remote methods)."""

    def __init__(
        self,
        buffer,
        out_dir: str,
        *,
        parser=None,
        batch_max: int = 1024,
    ):
        self.buffer = buffer
        self.out_dir = out_dir
        self.parser = parser
        self.batch_max = batch_max
        self.n_partitions = ray.get(buffer.num_partitions.remote())
        os.makedirs(os.path.join(out_dir, "_checkpoints"), exist_ok=True)

    def _ckpt_path(self, partition: int) -> str:
        return os.path.join(self.out_dir, "_checkpoints", f"p{partition}.json")

    def _offset(self, partition: int) -> int:
        m = manifest.read(self._ckpt_path(partition))
        return int(m["offset"]) if m else 0

    def _to_table(self, msgs: list[dict]) -> pa.Table:
        if self.parser is not None:
            return self.parser(msgs)
        return pa.Table.from_pylist(msgs)

    def _clear_uncommitted(self, partition: int, committed: int) -> None:
        """Drop shard files whose range starts at/after the committed
        offset: they were written by a consumer that crashed before its
        checkpoint advanced.  Without this, a replay that polls a
        LARGER batch (new messages arrived before the restart) would
        write an overlapping range beside the stale file and duplicate
        rows downstream."""
        import glob as _glob

        for f in _glob.glob(
            os.path.join(self.out_dir, f"part={partition}-off=*.parquet")
        ):
            rng = os.path.basename(f).split("off=", 1)[1][: -len(".parquet")]
            if int(rng.split("-")[0]) >= committed:
                os.remove(f)

    def tick(self) -> int:
        """One consume pass over every partition; returns messages
        consumed.  Committed ranges (below the checkpoint) are never
        touched; uncommitted shards from a crashed predecessor are
        cleared before re-consuming, so replay is exactly-once at the
        file level."""
        consumed = 0
        for p in range(self.n_partitions):
            start = self._offset(p)
            self._clear_uncommitted(p, start)
            while True:
                msgs = ray.get(self.buffer.poll.remote(p, start, self.batch_max))
                if not msgs:
                    break
                end = start + len(msgs)
                tbl = self._to_table(msgs)
                fpath = os.path.join(
                    self.out_dir, f"part={p}-off={start}-{end}.parquet"
                )
                pq.write_table(tbl, fpath + ".tmp")
                os.replace(fpath + ".tmp", fpath)
                # checkpoint advances ONLY after the shard is durable
                manifest.write_atomic(self._ckpt_path(p), {"offset": end})
                consumed += len(msgs)
                start = end
        return consumed
