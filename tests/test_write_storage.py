"""Object-store write path: the full writer lifecycle routed through
``fs/storage.py`` (VERDICT r8 next-round #1) plus concurrency control
(#2).

Executors cannot see driver-registered memory:// / SubTreeFileSystem
backends (separate processes), so the non-local matrix drives the SAME
code the Spark tasks run — ``_TaskWriter.consume/finish`` and the
driver commit protocol — in-process, then reads everything back through
the storage-routed planner/HFile/log readers. A real distributed Spark
write over a ``file://`` URI proves the URI plumbing end-to-end through
actual executor processes.
"""

from __future__ import annotations

import threading

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from hudi_rs_spark.write.writer import (
    HudiPyBatchWriter,
    HudiWriteMessage,
    _TaskWriter,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("ts", T.LongType()),
    ]
)


def _rows(n=24, start=0, ts=1) -> pa.Table:
    return pa.table(
        {
            "id": pa.array([start + i for i in range(n)], pa.int64()),
            "name": pa.array([f"n{start + i}" for i in range(n)], pa.string()),
            "city": pa.array([["a", "b"][i % 2] for i in range(n)], pa.string()),
            "ts": pa.array([ts] * n, pa.int64()),
        }
    )


def _write_inprocess(path: str, tbl: pa.Table, **options) -> HudiPyBatchWriter:
    """Run the writer lifecycle without Spark: same task-writer code the
    executors run, same driver commit protocol."""
    w = HudiPyBatchWriter(
        {"path": path, "recordkey.field": "id", "precombine.field": "ts",
         **options},
        SCHEMA, overwrite=False,
    )
    tw = _TaskWriter(w.cfg, 0, "0-0-0")
    for b in tbl.to_batches(max_chunksize=7):
        tw.consume(b)
    w.commit([HudiWriteMessage(stats=tw.finish())])
    return w


RI_OPTS = {
    "table.version": "8", "metadata.enable": "true",
    "metadata.recordindex.enable": "true",
    "metadata.columnstats.enable": "true",
}


class _LifecycleMatrix:
    """Shared assertions, parameterized by the backend path fixture."""

    def _path(self, tmp_path) -> str:
        raise NotImplementedError

    def test_insert_commit_and_listing(self, tmp_path):
        from hudi_rs_spark.fs.storage import storage_for
        from hudi_rs_spark.sources.hudi import HudiTable

        p = self._path(tmp_path)
        _write_inprocess(p, _rows())
        t = HudiTable(p, spark=None, listing="direct")
        assert len(t.timeline.instants) == 1
        slices = t.get_file_slices()
        assert slices and all(s.base_file is not None for s in slices)
        # every written base file reads back complete through storage
        st = storage_for(p)
        total = 0
        for s in slices:
            with st.open_seekable(f"{p}/{s.base_file_relative_path()}") as f:
                data = pq.read_table(f)
            assert data["_hoodie_record_key"].null_count == 0
            total += len(data)
        assert total == 24

    def test_mdt_and_record_index_round_trip(self, tmp_path):
        from hudi_rs_spark.metadata.files_partition import read_files_partition
        from hudi_rs_spark.metadata.record_index import read_record_index
        from hudi_rs_spark.sources.hudi import HudiTable

        p = self._path(tmp_path)
        _write_inprocess(p, _rows(), **RI_OPTS)
        idx = read_record_index(p)
        assert set(idx) == {str(i) for i in range(24)}
        t = HudiTable(p, spark=None, listing="direct")
        live = {(s.partition_path, s.file_id) for s in t.get_file_slices()}
        assert set(idx.values()) <= live
        files = read_files_partition(p)
        names = {
            n for rec in files.values() for n, _sz in rec.active_files()
        }
        on_disk = {
            s.base_file_relative_path().rsplit("/", 1)[-1]
            for s in t.get_file_slices()
        }
        assert on_disk <= names

    def test_append_then_second_commit_visible(self, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable

        p = self._path(tmp_path)
        _write_inprocess(p, _rows(10), **RI_OPTS)
        _write_inprocess(p, _rows(10, start=100), **RI_OPTS)
        t = HudiTable(p, spark=None, listing="direct")
        assert len(t.timeline.instants) == 2
        from hudi_rs_spark.metadata.record_index import read_record_index

        keys = set(read_record_index(p))
        assert {str(i) for i in range(10)} <= keys
        assert {str(100 + i) for i in range(10)} <= keys

    def test_timeline_instant_published_atomically(self, tmp_path):
        """No partial commit file is ever visible: the timeline dir holds
        only complete instants and (transiently) claim markers."""
        from hudi_rs_spark.fs.storage import storage_for

        p = self._path(tmp_path)
        _write_inprocess(p, _rows(4))
        st = storage_for(p)
        tdir = f"{p}/.hoodie"
        names = [e.name for e in st.list_dir(tdir) if not e.is_dir]
        assert not [n for n in names if n.endswith(".tmp")]


class TestLifecycleOnMemory(_LifecycleMatrix):
    _n = [0]

    def _path(self, tmp_path) -> str:
        TestLifecycleOnMemory._n[0] += 1
        return f"memory://wtest{TestLifecycleOnMemory._n[0]}"


class TestLifecycleOnArrowFS(_LifecycleMatrix):
    """SubTreeFileSystem over local, registered under a mock scheme —
    the real pyarrow.fs write code paths (open_output_stream, move,
    delete_file), mirroring test_storage.py::TestPlannerOnArrowFS."""

    _n = [0]

    def _path(self, tmp_path) -> str:
        from pyarrow import fs as pafs

        from hudi_rs_spark.fs.storage import ArrowFSStorage, register_storage

        TestLifecycleOnArrowFS._n[0] += 1
        authority = f"wbucket{TestLifecycleOnArrowFS._n[0]}"
        root = tmp_path / authority
        root.mkdir()
        subfs = pafs.SubTreeFileSystem(str(root), pafs.LocalFileSystem())
        st = ArrowFSStorage("mock", authority, filesystem=subfs)
        register_storage("mock", authority, st)
        return f"mock://{authority}"


class TestSparkWriteOverFileUri:
    def test_distributed_write_reads_back(self, spark, tmp_path):
        from hudi_rs_spark.sources.pyds import HudiPyDataSource

        try:
            spark.dataSource.register(HudiPyDataSource)
        except Exception:
            pass
        tdir = str(tmp_path / "t")
        uri = f"file://{tdir}"
        df = spark.createDataFrame(
            [(i, f"n{i}", "a", 1) for i in range(30)],
            "id long, name string, city string, ts long",
        )
        (df.repartition(3).write.format("hudi_py")
         .option("path", uri).option("recordkey.field", "id")
         .mode("append").save())
        back = (
            spark.read.format("hudi_py").option("path", tdir).load()
        )
        assert back.count() == 30
        assert {r.id for r in back.select("id").collect()} == set(range(30))


# ---------------------------------------------------------------------------
# concurrency (VERDICT #2)
# ---------------------------------------------------------------------------
class TestInstantClaim:
    def test_second_writer_same_instant_fails_loudly(self, tmp_path):
        from hudi_rs_spark.write.concurrency import ConcurrentWriteError

        p = str(tmp_path / "t")
        opts = {
            "path": p, "recordkey.field": "id", "precombine.field": "ts",
            "instant": "20240101000000000",
        }
        HudiPyBatchWriter(dict(opts), SCHEMA, overwrite=False)
        with pytest.raises(ConcurrentWriteError, match="already claimed"):
            HudiPyBatchWriter(dict(opts), SCHEMA, overwrite=False)

    def test_two_threads_one_commit_lands(self, tmp_path):
        """The VERDICT's acceptance shape: two concurrent writers racing
        one table/instant — exactly one commit lands, the loser raises."""
        from hudi_rs_spark.sources.hudi import HudiTable
        from hudi_rs_spark.write.concurrency import ConcurrentWriteError

        p = str(tmp_path / "t")
        outcomes: list[str] = []
        barrier = threading.Barrier(2)

        def run(start):
            barrier.wait()
            try:
                _write_inprocess(
                    p, _rows(8, start=start), instant="20240101000000000"
                )
                outcomes.append("ok")
            except ConcurrentWriteError:
                outcomes.append("lost")

        ts = [threading.Thread(target=run, args=(s,)) for s in (0, 1000)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        assert sorted(outcomes) == ["lost", "ok"]
        t = HudiTable(p, spark=None, listing="direct")
        assert len(t.timeline.instants) == 1
        assert sum(1 for _ in t.get_file_slices()) >= 1

    def test_marker_released_after_commit(self, tmp_path):
        from hudi_rs_spark.fs.storage import storage_for

        p = str(tmp_path / "t")
        _write_inprocess(p, _rows(4), instant="20240101000000000")
        st = storage_for(p)
        names = [e.name for e in st.list_dir(f"{p}/.hoodie")]
        assert not [n for n in names if n.endswith(".requested")]
        # and the same instant can be reclaimed for a RETRY after release
        # is NOT allowed — the instant is now a completed commit; a new
        # write takes a fresh instant
        _write_inprocess(p, _rows(4, start=50))

    def test_abort_releases_claim(self, tmp_path):
        p = str(tmp_path / "t")
        opts = {
            "path": p, "recordkey.field": "id", "precombine.field": "ts",
            "instant": "20240101000000000",
        }
        w = HudiPyBatchWriter(dict(opts), SCHEMA, overwrite=False)
        w.abort([])
        # claim released -> a retry with the same instant may proceed
        HudiPyBatchWriter(dict(opts), SCHEMA, overwrite=False)

    def test_services_take_the_same_path(self, spark, tmp_path):
        """compact/cluster/clean claim their instants: racing the same
        service instant fails loudly instead of double-publishing."""
        from hudi_rs_spark.write.concurrency import (
            ConcurrentWriteError,
            claim_instant,
        )
        from hudi_rs_spark.write.compact import compact
        from hudi_rs_spark.write.upsert import upsert

        try:
            from hudi_rs_spark.sources.pyds import HudiPyDataSource

            spark.dataSource.register(HudiPyDataSource)
        except Exception:
            pass
        p = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(i, f"n{i}", "a", 1) for i in range(12)],
            "id long, name string, city string, ts long",
        )
        (df.write.format("hudi_py").option("path", p)
         .option("recordkey.field", "id").option("precombine.field", "ts")
         .option("table.type", "MERGE_ON_READ").mode("append").save())
        upsert(
            spark.createDataFrame(
                [(3, "u3", "a", 2)], "id long, name string, city string, ts long"
            ),
            p,
        )
        # pre-claim the exact instant compact would use
        fixed = "20990101000000000"
        from hudi_rs_spark.write.config import WriteConfig

        claim_instant(WriteConfig(path=p, instant=fixed, operation="compact"))
        with pytest.raises(ConcurrentWriteError):
            compact(spark, p, instant=fixed)


class TestTaskMemoryBound:
    def test_skewed_partition_rolls_under_byte_cap(self, tmp_path):
        """A deliberately skewed frame under a tiny flush cap rolls into
        multiple base files per partition, round-trip identical
        (VERDICT r8 #7: no unbounded per-task buffer)."""
        from hudi_rs_spark.sources.hudi import HudiTable

        p = str(tmp_path / "t")
        n = 400
        tbl = pa.table(
            {
                "id": pa.array(list(range(n)), pa.int64()),
                "name": pa.array(["x" * 200] * n, pa.string()),
                # all rows in ONE partition: maximal skew
                "city": pa.array(["hot"] * n, pa.string()),
                "ts": pa.array([1] * n, pa.int64()),
            }
        )
        _write_inprocess(
            p, tbl, **{
                "partitionpath.field": "city",
                "max.buffer.bytes": "20000",  # ~1/5 of the data
            },
        )
        t = HudiTable(p, spark=None, listing="direct")
        slices = t.get_file_slices()
        assert len(slices) >= 3  # rolled into several file groups
        from hudi_rs_spark.fs.storage import storage_for

        st = storage_for(p)
        got = []
        for s in slices:
            with st.open_seekable(f"{p}/{s.base_file_relative_path()}") as f:
                got.extend(pq.read_table(f)["id"].to_pylist())
        assert sorted(got) == list(range(n))

    def test_global_cap_bounds_many_partitions(self, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable

        p = str(tmp_path / "t")
        n = 300
        tbl = pa.table(
            {
                "id": pa.array(list(range(n)), pa.int64()),
                "name": pa.array(["y" * 200] * n, pa.string()),
                "city": pa.array([f"c{i % 10}" for i in range(n)], pa.string()),
                "ts": pa.array([1] * n, pa.int64()),
            }
        )
        _write_inprocess(
            p, tbl, **{
                "partitionpath.field": "city",
                "max.buffer.bytes": "8000",
            },
        )
        t = HudiTable(p, spark=None, listing="direct")
        assert {s.partition_path for s in t.get_file_slices()} == {
            f"city=c{i}" for i in range(10)
        }


class TestLockProvider:
    def test_storage_lock_mutual_exclusion(self, tmp_path):
        from hudi_rs_spark.write.concurrency import (
            ConcurrentWriteError,
            StorageLockProvider,
        )

        p = str(tmp_path / "t")
        a = StorageLockProvider(p)
        b = StorageLockProvider(p)
        assert a.try_lock()
        assert not b.try_lock()
        a.unlock()
        assert b.try_lock()
        b.unlock()
        with a:
            with pytest.raises(ConcurrentWriteError):
                b.lock(timeout_s=0.3, poll_s=0.05)

    def test_lock_on_memory_backend(self, tmp_path):
        from hudi_rs_spark.write.concurrency import StorageLockProvider

        a = StorageLockProvider("memory://locktest")
        b = StorageLockProvider("memory://locktest")
        assert a.try_lock() and not b.try_lock()
        a.unlock()
        assert b.try_lock()
        b.unlock()


class TestStaleClaimRelease:
    def test_rollback_releases_crashed_claims(self, tmp_path):
        """A crashed writer's .requested marker pins the archival floor;
        rollback (the no-writer-is-live declaration) releases it, while
        completed instants' stale markers and live history survive."""
        from hudi_rs_spark.write.concurrency import claim_instant
        from hudi_rs_spark.write.config import WriteConfig
        from hudi_rs_spark.write.rollback import rollback_failed_writes

        p = str(tmp_path / "t")
        _write_inprocess(p, _rows(6))
        # simulate a crashed writer: claim never released, no commit
        dead = WriteConfig(path=p, instant="20990101000000000")
        claim_instant(dead)
        import os

        tdir = os.path.join(p, ".hoodie")
        assert any(n.endswith(".requested") for n in os.listdir(tdir))
        rollback_failed_writes(p)
        assert not any(n.endswith(".requested") for n in os.listdir(tdir))
        from hudi_rs_spark.sources.hudi import HudiTable

        assert len(HudiTable(p, spark=None, listing="direct").timeline.instants) == 1

# Driver fast lane (r14, VERDICT r13 item 1): slow-lane suite — infra/
# feature matrix whose surfaces the oracle write rows exercise end-to-end;
# the builder runs the full lane each round via `pytest -m "slow or not slow"`.
pytestmark = pytest.mark.slow
