"""Streaming Hudi sink: ``df.writeStream.format("hudi_py")`` — one
timeline instant per micro-batch, exactly-once via commit-metadata
batch-id idempotence.

The natural dual of the commit-offset stream READER
(sources/pyds.py:HudiPyStreamReader, reference's incremental pulls):

    q = (events.writeStream.format("hudi_py")
         .option("path", p).option("recordkey.field", "id")
         .option("checkpointLocation", cp).start())

Semantics:
- Each micro-batch writes new file groups executor-side (the same
  vectorized task writer as the batch path) under a per-batch instant
  derived deterministically from the query's base instant + batchId, so
  every task of a batch agrees on the instant without coordination.
- ``commit(messages, batchId)`` publishes the instant with
  ``extraMetadata["streaming.batchId"]``. On restart, Spark replays the
  last unacknowledged batch: commit() finds the batchId already in the
  timeline and SKIPS publishing (removing the replayed duplicate files)
  — readers only see files reachable from completed instants, so the
  table observes each batch exactly once.
- Downstream ``spark.readStream.format("hudi_py")`` consumes the commits
  incrementally — stream→Hudi→stream composes.

Scale: executors never coordinate; the driver's per-batch work is
O(written files) stats + an O(active timeline) idempotence scan (the
active timeline is bounded by archival). Appends-only here; streaming
upserts route through write/upsert.py in a foreachBatch.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSourceStreamArrowWriter

from hudi_rs_spark.write.config import WriteConfig, new_instant
from hudi_rs_spark.write.writer import (
    HudiWriteMessage,
    _local,
    commit_instant,
    data_avro_schema,
    init_table,
    timeline_dir,
    write_task,
)

BATCH_ID_KEY = "streaming.batchId"


def batch_instant(table_path: str, batch_id: int) -> str:
    """The micro-batch's timeline instant, agreed WITHOUT coordination.

    Spark re-instantiates the Python stream writer per micro-batch (and
    executors get their own deserialized copies), so no instance state
    survives from ``write()`` tasks to ``commit()`` — any clock-based
    instant would differ per process. Instead the first process to need
    batch N's instant publishes one atomically (write-temp + os.link —
    link fails if the file exists, so every reader sees one complete
    17-digit value), and everyone else reads it. The sidecar persists
    across restarts, so a REPLAYED batch reuses its original instant:
    replay-written files differ only in write token, which the reader's
    retried-write rule (newer token wins within an instant) dedupes even
    before the commit-ledger check skips re-publishing."""
    import uuid

    d = os.path.join(_local(table_path), ".hoodie", ".stream_instants")
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, str(int(batch_id)))
    if not os.path.exists(p):
        tmp = f"{p}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            f.write(new_instant())
        try:
            os.link(tmp, p)
        except FileExistsError:
            pass  # another task won the race; its value is complete
        finally:
            os.remove(tmp)
    with open(p) as f:
        return f.read().strip()


def committed_batch_ids(cfg: WriteConfig) -> set[int]:
    """Batch ids already published to the timeline (completed commits
    only) — the idempotence ledger for restart replays."""
    tdir = timeline_dir(cfg)
    out: set[int] = set()
    if not os.path.isdir(tdir):
        return out
    for name in os.listdir(tdir):
        if name.endswith((".commit", ".deltacommit")):
            try:
                with open(os.path.join(tdir, name), "rb") as f:
                    meta = json.loads(f.read().decode("utf-8") or "{}")
            except (OSError, ValueError):
                continue
            bid = (meta.get("extraMetadata") or {}).get(BATCH_ID_KEY)
            if bid is not None:
                try:
                    out.add(int(bid))
                except ValueError:
                    pass
    return out


class HudiPyStreamWriter(DataSourceStreamArrowWriter):
    def __init__(self, options: dict, schema):
        from hudi_rs_spark.write.writer import resolve_index_flags

        self.cfg = WriteConfig.from_options(options)
        # a stream into a stats/index-advertising table must keep those
        # partitions widening, exactly like a batch append (stale
        # partition_stats would make exclusion pruning WRONG)
        resolve_index_flags(self.cfg)
        self.schema = schema

    def _batch_cfg(self, batch_id: int) -> WriteConfig:
        from dataclasses import replace

        return replace(self.cfg, instant=batch_instant(self.cfg.path, batch_id))

    def write(self, iterator):
        from pyspark import TaskContext

        tc = TaskContext.get()
        bid = tc.getLocalProperty("streaming.sql.batchId") if tc else None
        if bid is None:
            raise RuntimeError(
                "hudi_py stream writer: no streaming.sql.batchId task "
                "property (not running under a streaming query?)"
            )
        return write_task(self._batch_cfg(int(bid)), iterator)

    def commit(self, messages, batchId: int) -> None:
        stats = [s for m in messages if m is not None for s in m.stats]
        cfg = self._batch_cfg(batchId)
        init_table(cfg)
        if batchId in committed_batch_ids(cfg):
            # restart replay of an already-published batch: drop the
            # duplicate (uncommitted, hence invisible) files and ack
            base = _local(cfg.path)
            for s in stats:
                try:
                    os.remove(os.path.join(base, s["path"]))
                except OSError:
                    pass
            return
        from hudi_rs_spark.write.writer import mdt_enabled

        emit_mdt = mdt_enabled(cfg)
        commit_instant(
            cfg, stats,
            data_avro_schema(self.schema, cfg.table_name),
            extra_metadata={BATCH_ID_KEY: str(batchId)},
        )
        if emit_mdt:
            from hudi_rs_spark.write.mdt import apply_commit_to_mdt

            apply_commit_to_mdt(cfg, stats)

    def abort(self, messages, batchId: int) -> None:
        base = _local(self.cfg.path)
        for m in messages:
            if m is None:
                continue
            for s in m.stats:
                try:
                    os.remove(os.path.join(base, s["path"]))
                except OSError:
                    pass
