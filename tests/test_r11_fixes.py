"""Regression tests for the round-11 fixes (VERDICT r10).

1. (verdict wrong #1) check_commit_conflicts failed OPEN on unreadable
   concurrent commit metadata (`except Exception: continue`): a
   transient storage error reading a competitor's metadata silently
   skipped conflict detection for that instant — the exact lost update
   OCC exists to prevent. Now it retries once then raises the
   retryable ConcurrentWriteError.
"""

from __future__ import annotations

import pytest


class _OccHarness:
    """Seed + raw-writer helpers (same shape as TestCrossInstantOCC)."""

    def _schema(self):
        from pyspark.sql import types as T

        return T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("name", T.StringType()),
                T.StructField("ts", T.LongType()),
            ]
        )

    def _seed(self, path):
        import pyarrow as pa

        from hudi_rs_spark.write.writer import (
            HudiPyBatchWriter,
            HudiWriteMessage,
            _TaskWriter,
        )

        w = HudiPyBatchWriter(
            {"path": path, "recordkey.field": "id", "precombine.field": "ts",
             "table.type": "MERGE_ON_READ"},
            self._schema(), overwrite=False,
        )
        tw = _TaskWriter(w.cfg, 0, "0-0-0")
        tbl = pa.table(
            {
                "id": pa.array(range(8), pa.int64()),
                "name": pa.array([f"n{i}" for i in range(8)], pa.string()),
                "ts": pa.array([1] * 8, pa.int64()),
            }
        )
        for b in tbl.to_batches():
            tw.consume(b)
        w.commit([HudiWriteMessage(stats=tw.finish())])
        from hudi_rs_spark.sources.hudi import HudiTable

        s = HudiTable(path, spark=None, listing="direct").get_file_slices()[0]
        return s.file_id, s.base_file.commit_timestamp

    def _update_batch(self, ids, fid, base_instant, name="x", ts=9):
        import pyarrow as pa

        n = len(ids)
        return pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "name": pa.array([f"{name}{i}" for i in ids], pa.string()),
                "ts": pa.array([ts] * n, pa.int64()),
                "__hoodie_target_file_id": pa.array([fid] * n, pa.string()),
                "__hoodie_target_base_instant": pa.array(
                    [base_instant] * n, pa.string()
                ),
                "__hoodie_log_version": pa.array([1] * n, pa.int32()),
            }
        ).to_batches()

    def _upsert_writer(self, path):
        import time

        from pyspark.sql import types as T

        from hudi_rs_spark.write.writer import HudiPyBatchWriter

        time.sleep(0.002)  # distinct ms-precision instants per writer
        # declare the tag columns the update batches carry (the writer
        # refuses UNTAGGED upserts on non-empty tables — r13 guard)
        tagged = T.StructType(
            list(self._schema().fields)
            + [
                T.StructField("__hoodie_target_file_id", T.StringType()),
                T.StructField("__hoodie_target_base_instant", T.StringType()),
                T.StructField("__hoodie_log_version", T.IntegerType()),
            ]
        )
        return HudiPyBatchWriter(
            {"path": path, "recordkey.field": "id", "precombine.field": "ts",
             "table.type": "MERGE_ON_READ", "operation": "upsert"},
            tagged, overwrite=False,
        )


class TestOccFailsClosed(_OccHarness):
    def _race(self, path, fid, base_instant):
        """A and B concurrent; B publishes first touching ``fid``;
        returns A's writer + messages, commit not yet attempted."""
        from hudi_rs_spark.write.writer import HudiWriteMessage, _TaskWriter

        a = self._upsert_writer(path)
        b = self._upsert_writer(path)
        tw_b = _TaskWriter(b.cfg, 0, "0-0-0")
        for batch in self._update_batch([1, 2], fid, base_instant, "b"):
            tw_b.consume(batch)
        b.commit([HudiWriteMessage(stats=tw_b.finish())])
        tw_a = _TaskWriter(a.cfg, 0, "0-0-1")
        for batch in self._update_batch([2, 3], fid, base_instant, "a"):
            tw_a.consume(batch)
        return a, [HudiWriteMessage(stats=tw_a.finish())]

    def test_persistently_unreadable_metadata_fails_closed(
        self, tmp_path, monkeypatch
    ):
        # B's metadata is unreadable on EVERY attempt: A must refuse to
        # publish (ConcurrentWriteError), never silently skip the check
        from hudi_rs_spark.timeline.timeline import Timeline
        from hudi_rs_spark.write.concurrency import ConcurrentWriteError

        path = str(tmp_path / "t")
        fid, base_instant = self._seed(path)
        a, msgs = self._race(path, fid, base_instant)

        real = Timeline.metadata_for

        def flaky(self, instant):
            if instant.timestamp not in a._read_point:  # the concurrent one
                raise OSError("injected: storage read failed")
            return real(self, instant)

        monkeypatch.setattr(Timeline, "metadata_for", flaky)
        with pytest.raises(ConcurrentWriteError, match="unreadable"):
            a.commit(msgs)
        a.abort(msgs)

    def test_transient_error_retries_and_still_detects_conflict(
        self, tmp_path, monkeypatch
    ):
        # first read of the competitor's metadata errors, the retry
        # succeeds — and the conflict IS detected (not skipped)
        from hudi_rs_spark.timeline.timeline import Timeline
        from hudi_rs_spark.write.concurrency import ConcurrentWriteError

        path = str(tmp_path / "t")
        fid, base_instant = self._seed(path)
        a, msgs = self._race(path, fid, base_instant)

        real = Timeline.metadata_for
        failed_once: set[str] = set()

        def once(self, instant):
            ts = instant.timestamp
            if ts not in a._read_point and ts not in failed_once:
                failed_once.add(ts)
                raise OSError("injected: transient storage error")
            return real(self, instant)

        monkeypatch.setattr(Timeline, "metadata_for", once)
        with pytest.raises(ConcurrentWriteError, match="conflict"):
            a.commit(msgs)
        a.abort(msgs)
        assert failed_once  # the injection actually fired
