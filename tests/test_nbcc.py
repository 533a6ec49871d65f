"""NON_BLOCKING_CONCURRENCY_CONTROL (hoodie.write.concurrency.mode,
Hudi 1.0, v8+ MOR): concurrent LOG-APPEND deltacommits to the same file
group all land — the readers' merge linearizes them by ordering field +
instant order (the completion-time semantics the reference builds its
slices on, file_group/builder.rs:69-154, merge/ordering.rs:36-46).
Base rewrites (compaction) and replacements (overwrite/clustering)
still conflict in either mode.
"""

from __future__ import annotations

import time

import pyarrow as pa
import pytest
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("ts", T.LongType()),
    ]
)

@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from hudi_rs_spark.sources.pyds import HudiPyDataSource

    spark.dataSource.register(HudiPyDataSource)


BASE_OPTS = {
    "recordkey.field": "id",
    "precombine.field": "ts",
    "table.type": "MERGE_ON_READ",
    "table.version": "8",
}


def _seed(path, **extra):
    from hudi_rs_spark.sources.hudi import HudiTable
    from hudi_rs_spark.write.writer import (
        HudiPyBatchWriter,
        HudiWriteMessage,
        _TaskWriter,
    )

    w = HudiPyBatchWriter(
        {"path": path, **BASE_OPTS, **extra}, SCHEMA, overwrite=False
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
    s = HudiTable(path, spark=None, listing="direct").get_file_slices()[0]
    return s.file_id, s.base_file.commit_timestamp


def _upsert_writer(path, mode="nbcc"):
    from hudi_rs_spark.write.writer import HudiPyBatchWriter

    time.sleep(0.002)  # distinct ms-precision instants per writer
    # declare the tag columns the update batches carry (the writer
    # refuses UNTAGGED upserts on non-empty tables — r13 guard)
    tagged = T.StructType(
        list(SCHEMA.fields)
        + [
            T.StructField("__hoodie_target_file_id", T.StringType()),
            T.StructField("__hoodie_target_base_instant", T.StringType()),
            T.StructField("__hoodie_log_version", T.IntegerType()),
        ]
    )
    return HudiPyBatchWriter(
        {
            "path": path,
            **BASE_OPTS,
            "operation": "upsert",
            "concurrency.mode": mode,
        },
        tagged,
        overwrite=False,
    )


def _update_batches(ids, fid, base_instant, name="x", ts=9):
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


def _commit_update(writer, ids, fid, base_instant, name, ts=9):
    from hudi_rs_spark.write.writer import HudiWriteMessage, _TaskWriter

    tw = _TaskWriter(writer.cfg, 0, f"0-0-{name}")
    for b in _update_batches(ids, fid, base_instant, name, ts):
        tw.consume(b)
    writer.commit([HudiWriteMessage(stats=tw.finish())])


def _snap(spark, path):
    from hudi_rs_spark.sources.hudi import HudiTable

    return {
        r.id: (r.name, r.ts) for r in HudiTable(path, spark).read().collect()
    }


class TestNbccValidation:
    def test_rejected_on_cow(self, tmp_path):
        from hudi_rs_spark.write.writer import HudiPyBatchWriter

        with pytest.raises(ValueError, match="NON_BLOCKING"):
            HudiPyBatchWriter(
                {
                    "path": str(tmp_path / "t"),
                    "recordkey.field": "id",
                    "concurrency.mode": "NON_BLOCKING_CONCURRENCY_CONTROL",
                },
                SCHEMA,
                overwrite=False,
            )

    def test_rejected_on_v6(self, tmp_path):
        from hudi_rs_spark.write.writer import HudiPyBatchWriter

        with pytest.raises(ValueError, match="v8"):
            HudiPyBatchWriter(
                {
                    "path": str(tmp_path / "t"),
                    **BASE_OPTS,
                    "table.version": "6",
                    "concurrency.mode": "nbcc",
                },
                SCHEMA,
                overwrite=False,
            )

    def test_unknown_mode_rejected(self, tmp_path):
        from hudi_rs_spark.write.writer import HudiPyBatchWriter

        with pytest.raises(ValueError, match="concurrency.mode"):
            HudiPyBatchWriter(
                {
                    "path": str(tmp_path / "t"),
                    **BASE_OPTS,
                    "concurrency.mode": "bogus",
                },
                SCHEMA,
                overwrite=False,
            )


class TestNbccAppends:
    def test_concurrent_log_appends_both_commit(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable

        path = str(tmp_path / "t")
        fid, base_instant = _seed(path)
        a = _upsert_writer(path)
        b = _upsert_writer(path)
        _commit_update(b, [1], fid, base_instant, "b", ts=9)
        _commit_update(a, [2], fid, base_instant, "a", ts=9)  # must NOT raise
        t = HudiTable(path, spark=None, listing="direct")
        assert len(t.timeline.instants) == 3
        snap = _snap(spark, path)
        assert snap[1] == ("b1", 9) and snap[2] == ("a2", 9)
        assert len(snap) == 8

    def test_same_key_resolves_by_ordering_not_commit_order(
        self, spark, tmp_path
    ):
        path = str(tmp_path / "t")
        fid, base_instant = _seed(path)
        a = _upsert_writer(path)
        b = _upsert_writer(path)
        # B writes the HIGHER ordering value and commits FIRST; A lands
        # later with a lower ordering value — B must still win the merge
        _commit_update(b, [3], fid, base_instant, "b", ts=9)
        _commit_update(a, [3], fid, base_instant, "a", ts=5)
        assert _snap(spark, path)[3] == ("b3", 9)

    def test_occ_mode_still_conflicts(self, tmp_path):
        from hudi_rs_spark.write.concurrency import ConcurrentWriteError
        from hudi_rs_spark.write.writer import HudiWriteMessage, _TaskWriter

        path = str(tmp_path / "t")
        fid, base_instant = _seed(path)
        a = _upsert_writer(path, mode="occ")
        b = _upsert_writer(path, mode="occ")
        _commit_update(b, [1], fid, base_instant, "b")
        tw = _TaskWriter(a.cfg, 0, "0-0-a")
        for bt in _update_batches([2], fid, base_instant, "a"):
            tw.consume(bt)
        msgs = [HudiWriteMessage(stats=tw.finish())]
        with pytest.raises(ConcurrentWriteError, match="conflict"):
            a.commit(msgs)
        a.abort(msgs)

    def test_concurrent_base_rewrite_still_conflicts(self, spark, tmp_path):
        """An NBCC log append racing an inline compaction of the same
        group must still fail: its log would anchor at the superseded
        base and vanish from the compacted slice (the NON-blocking way
        to run this race is the scheduled-compaction protocol,
        write/async_compact.py)."""
        from hudi_rs_spark.write.compact import compact
        from hudi_rs_spark.write.concurrency import ConcurrentWriteError
        from hudi_rs_spark.write.upsert import upsert
        from hudi_rs_spark.write.writer import HudiWriteMessage, _TaskWriter

        path = str(tmp_path / "t")
        fid, base_instant = _seed(path)
        upsert(
            spark.createDataFrame(
                [(1, "dirty", 2)], "id long, name string, ts long"
            ),
            path,
        )
        a = _upsert_writer(path)  # nbcc, read point includes the upsert
        assert compact(spark, path) >= 1
        tw = _TaskWriter(a.cfg, 0, "0-0-a")
        for bt in _update_batches([2], fid, base_instant, "a"):
            tw.consume(bt)
        msgs = [HudiWriteMessage(stats=tw.finish())]
        with pytest.raises(ConcurrentWriteError, match="conflict"):
            a.commit(msgs)
        a.abort(msgs)

    def test_overwrite_stays_strict_under_nbcc(self, tmp_path):
        from hudi_rs_spark.write.concurrency import ConcurrentWriteError
        from hudi_rs_spark.write.writer import (
            HudiPyBatchWriter,
            HudiWriteMessage,
            _TaskWriter,
        )

        path = str(tmp_path / "t")
        fid, base_instant = _seed(path)
        a = HudiPyBatchWriter(
            {"path": path, **BASE_OPTS, "concurrency.mode": "nbcc"},
            SCHEMA,
            overwrite=True,
        )
        b = _upsert_writer(path)
        _commit_update(b, [1], fid, base_instant, "b")
        tw = _TaskWriter(a.cfg, 0, "0-0-a")
        tw.consume(
            pa.record_batch(
                {
                    "id": pa.array([50], pa.int64()),
                    "name": pa.array(["o"], pa.string()),
                    "ts": pa.array([9], pa.int64()),
                }
            )
        )
        msgs = [HudiWriteMessage(stats=tw.finish())]
        with pytest.raises(ConcurrentWriteError, match="overwrite|conflict"):
            a.commit(msgs)
        a.abort(msgs)


class TestNbccOnBucketTables:
    def test_concurrent_bucket_appends_both_commit(self, spark, tmp_path):
        """Bucket routing + NBCC compose: two writers hash-route to the
        SAME bucket group concurrently and both land; the merge resolves
        by ordering field."""
        from hudi_rs_spark.sources.hudi import HudiTable
        from hudi_rs_spark.write.upsert import upsert

        t = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(i, f"n{i}", 1) for i in range(12)], "id long, name string, ts long"
        )
        upsert(df, t, **{
            "recordkey.field": "id", "precombine.field": "ts",
            "table.type": "MERGE_ON_READ", "table.version": "8",
            "index.type": "bucket", "bucket.index.num.buckets": "2",
            "hoodie.table.name": "b",
        })
        # sequential upserts simulating the concurrent interleaving:
        # both claim AFTER the seed, land in either order under nbcc
        upsert(
            spark.createDataFrame([(1, "a1", 9)], "id long, name string, ts long"),
            t, **{"concurrency.mode": "nbcc"},
        )
        upsert(
            spark.createDataFrame([(1, "b1", 5)], "id long, name string, ts long"),
            t, **{"concurrency.mode": "nbcc"},
        )
        snap = {r.id: (r.name, r.ts)
                for r in HudiTable(t, spark).read().collect()}
        assert snap[1] == ("a1", 9)  # higher ordering wins, not commit order
        assert len(snap) == 12
