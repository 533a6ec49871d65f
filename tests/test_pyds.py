"""Python DataSource connector (sources/pyds.py): spark.read.format /
SQL-DDL registration surface, checked for exact equivalence against the
eager HudiTable path across the golden-fixture variants — the same
differential the reference runs between its DataFusion SQL layer and
the core merged read (datafusion query_tests.rs:292)."""

from __future__ import annotations

import pytest

from hudi_rs_spark import HudiTable
from tests.conftest import extract_fixture

VARIANTS = [
    # COW across versions / keygens / meta-fields
    "sample_table/cow/v6_nonpartitioned.zip",
    "sample_table/cow/v6_simplekeygen_nonhivestyle.zip",
    "sample_table/cow/v6_complexkeygen_hivestyle.zip",
    "sample_table/cow/v6_simplekeygen_hivestyle_no_metafields.zip",
    "sample_table/cow/v8_simplekeygen_nonhivestyle.zip",
    "sample_table/cow/v9_txns_simple_meta.zip",
    "sample_table/cow/v9_txns_nonpart_nometa.zip",
    "sample_table/cow/v6_simplekeygen_nonhivestyle_overwritetable.zip",
    "sample_table/cow/v6_timebasedkeygen_nonhivestyle.zip",
    "sample_table/cow/v8_complexkeygen_hivestyle.zip",
    "sample_table/cow/v9_timebasedkeygen_epochmillis.zip",
    "sample_table/cow/v9_timebasedkeygen_unixtimestamp.zip",
    "sample_table/cow/v9_txns_simple_overwrite.zip",
    "sample_table/cow/v6_empty.zip",
    # MOR (log merge on executors)
    "sample_table/mor/parquet/v6_nonpartitioned.zip",
    "sample_table/mor/parquet/v6_nonpartitioned_rollback.zip",
    "sample_table/mor/parquet/v6_simplekeygen_nonhivestyle.zip",
    "sample_table/mor/parquet/v6_simplekeygen_nonhivestyle_overwritetable.zip",
    "sample_table/mor/parquet/v6_complexkeygen_hivestyle.zip",
    "sample_table/mor/avro/v9_nonpartitioned_rollback.zip",
    "sample_table/mor/avro/v9_timebasedkeygen_nonhivestyle.zip",
    "sample_table/mor/avro/v9_txns_simple_meta.zip",
    "sample_table/mor/avro/v9_txns_simple_overwrite.zip",
    "sample_table/mor/avro/v9_txns_complex_nometa.zip",
    "sample_table/mor/avro/v9_txns_nonpart_meta.zip",
    # trips lifecycles: inserts + updates + deletes
    "quickstart_trips_table/mor/avro/v6_trips_8i1u.zip",
    "quickstart_trips_table/mor/avro/v6_trips_8i3d.zip",
    "quickstart_trips_table/mor/avro/v8_trips_8i3u1d.zip",
]


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from hudi_rs_spark.sources.pyds import HudiPyDataSource

    spark.dataSource.register(HudiPyDataSource)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(map(tuple, df.select(*cols).collect()))


@pytest.mark.parametrize("zip_rel", VARIANTS, ids=VARIANTS)
def test_connector_equals_eager_read(spark, zip_rel):
    path = extract_fixture(zip_rel)
    eager = HudiTable(path, spark).read()
    conn = spark.read.format("hudi_py").option("path", path).load()
    assert conn.schema == eager.schema
    assert _rows(conn) == _rows(eager)


def test_sql_ddl_registration_and_filter(spark, v8_trips_table):
    """The reference's CREATE EXTERNAL TABLE ... STORED AS HUDI analog:
    USING hudi_py in plain SQL, filters applied through the view."""
    spark.sql("DROP VIEW IF EXISTS trips_pyds")
    spark.sql(
        f"CREATE TEMPORARY VIEW trips_pyds USING hudi_py OPTIONS (path '{v8_trips_table}')"
    )
    got = {
        (r["rider"], r["fare"])
        for r in spark.sql(
            "SELECT rider, fare FROM trips_pyds WHERE fare > 30"
        ).collect()
    }
    expect = {
        (r["rider"], r["fare"])
        for r in HudiTable(v8_trips_table, spark)
        .read()
        .filter("fare > 30")
        .select("rider", "fare")
        .collect()
    }
    assert got == expect and got  # non-empty


def test_time_travel_option(spark, v8_trips_table):
    from hudi_rs_spark.config.read_config import HudiReadOptions

    t = HudiTable(v8_trips_table, spark)
    first = t.timeline.instants[0].timestamp
    conn = (
        spark.read.format("hudi_py")
        .option("path", v8_trips_table)
        .option("asOf", first)
        .load()
    )
    eager = t.read(HudiReadOptions(as_of_timestamp=first))
    assert _rows(conn) == _rows(eager)


def test_read_optimized_option(spark, v8_trips_table):
    from hudi_rs_spark.config.read_config import HudiReadOptions

    t = HudiTable(v8_trips_table, spark)
    conn = (
        spark.read.format("hudi_py")
        .option("path", v8_trips_table)
        .option("readOptimized", "true")
        .load()
    )
    eager = t.read(HudiReadOptions(use_read_optimized_mode=True))
    assert _rows(conn) == _rows(eager)
    # and it diverges from the merged snapshot (logs exist in v8 trips)
    assert _rows(conn) != _rows(t.read())


def test_filter_pushdown_prunes_partitions(spark):
    """A partition-equality SQL filter reaches pushFilters and prunes
    the planned file slices (fewer InputPartitions), while results stay
    correct because every filter is also re-applied by Spark."""
    from pyspark.sql.datasource import EqualTo

    from hudi_rs_spark.sources.pyds import HudiPyDataSource

    path = extract_fixture("sample_table/cow/v6_complexkeygen_hivestyle.zip")
    ds = HudiPyDataSource({"path": path})
    reader_all = ds.reader(ds.schema())
    all_parts = reader_all.partitions()

    reader_pruned = ds.reader(ds.schema())
    leftover = list(reader_pruned.pushFilters([EqualTo(("byteField",), 10)]))
    assert len(leftover) == 1  # reported unsupported -> Spark re-applies
    pruned_parts = reader_pruned.partitions()
    assert 0 < len(pruned_parts) < len(all_parts)

    # end-to-end through SQL with the same predicate
    conn = (
        spark.read.format("hudi_py").option("path", path).load()
        .filter("byteField = 10")
    )
    eager = HudiTable(path, spark).read().filter("byteField = 10")
    assert _rows(conn) == _rows(eager)


def test_unknown_path_errors(spark):
    with pytest.raises(Exception):
        spark.read.format("hudi_py").load()


class TestStreamingSource:
    """readStream.format("hudi_py"): completed commits are the offset
    log; each micro-batch is the incremental window between offsets."""

    C1, C2 = "20240101000000000", "20240201000000000"

    @staticmethod
    def _run_stream(spark, base, out, ckpt):
        import glob
        import time

        df = spark.readStream.format("hudi_py").option("path", base).load()
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        deadline = time.time() + 240
        while q.isActive and time.time() < deadline:
            time.sleep(2)
        assert not q.isActive, "stream did not finish availableNow batch"
        assert q.exception() is None
        if not glob.glob(out + "/*.parquet"):
            return []
        return sorted(
            (r["id"], r["val"], r["_hoodie_commit_time"])
            for r in spark.read.parquet(out).collect()
        )

    def test_commit_offsets_exactly_once(self, spark, tmp_path):
        from tests.synth import SynthTable

        base = str(tmp_path / "tbl")
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        t = SynthTable(base)
        t.write_base("g1-0", self.C1, {"id": ["a"], "ts": [1], "val": ["v1"]}, ["a"])
        t.commit(self.C1)

        first = self._run_stream(spark, base, out, ckpt)
        assert first == [("a", "v1", self.C1)]

        # a new commit lands; the restarted (checkpointed) stream emits
        # ONLY the new commit's rows — no replay of C1
        t.write_base("g2-0", self.C2, {"id": ["b"], "ts": [1], "val": ["v2"]}, ["b"])
        t.commit(self.C2)
        second = self._run_stream(spark, base, out, ckpt)
        assert second == [("a", "v1", self.C1), ("b", "v2", self.C2)]

    def test_starting_offsets_latest_skips_history(self, spark, tmp_path):
        from tests.synth import SynthTable

        base = str(tmp_path / "tbl2")
        out, ckpt = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
        t = SynthTable(base)
        t.write_base("g1-0", self.C1, {"id": ["a"], "ts": [1], "val": ["v1"]}, ["a"])
        t.commit(self.C1)

        import glob
        import time

        df = (
            spark.readStream.format("hudi_py")
            .option("path", base)
            .option("startingOffsets", "latest")
            .load()
        )
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        deadline = time.time() + 240
        while q.isActive and time.time() < deadline:
            time.sleep(2)
        assert q.exception() is None
        files = glob.glob(out + "/*.parquet")
        rows = spark.read.parquet(out).collect() if files else []
        assert rows == []  # history skipped; nothing new arrived


def test_incremental_batch_options(spark, v8_trips_table):
    """startTimestamp/endTimestamp options run the incremental query
    through the connector — equivalent to HudiTable.read_incremental."""
    t = HudiTable(v8_trips_table, spark)
    commits = [i.timestamp for i in t.timeline.instants]
    start, end = commits[0], commits[-1]
    conn = (
        spark.read.format("hudi_py")
        .option("path", v8_trips_table)
        .option("startTimestamp", start)
        .option("endTimestamp", end)
        .load()
    )
    eager = t.read_incremental(start, end)
    assert _rows(conn) == _rows(eager)
    assert len(_rows(conn)) > 0


def test_input_partitions_chunking(spark, v8_trips_table):
    """inputPartitions caps the scan task count (reference
    InputPartitions: slices chunked into N groups) without changing
    results; eager path maps it to a narrow coalesce."""
    from hudi_rs_spark.config.read_config import HudiReadOptions
    from hudi_rs_spark.sources.pyds import HudiPyDataSource

    ds = HudiPyDataSource({"path": v8_trips_table})
    n_all = len(ds.reader(ds.schema()).partitions())
    assert n_all > 2

    ds2 = HudiPyDataSource({"path": v8_trips_table, "inputPartitions": "2"})
    parts = ds2.reader(ds2.schema()).partitions()
    assert len(parts) == 2

    conn = (
        spark.read.format("hudi_py")
        .option("path", v8_trips_table)
        .option("inputPartitions", "2")
        .load()
    )
    eager = HudiTable(v8_trips_table, spark).read(
        HudiReadOptions(input_partitions=2)
    )
    assert eager.rdd.getNumPartitions() <= 2
    assert _rows(conn) == _rows(eager)


class TestStreamRateLimit:
    """maxCommitsPerTrigger / maxBytesPerTrigger bound how far
    latestOffset advances, so a backlog drains as bounded micro-batches
    instead of one giant first batch (driven through the reader's offset
    API — the exact call sequence MicroBatchExecution issues)."""

    COMMITS = ["2024010100000000%d" % i for i in range(5)]

    def _backlog_table(self, tmp_path):
        from tests.synth import SynthTable

        base = str(tmp_path / "tbl")
        t = SynthTable(base)
        for n, c in enumerate(self.COMMITS):
            t.write_base(
                f"g{n}-0", c, {"id": [f"k{n}"], "ts": [1], "val": ["v"]},
                [f"k{n}"],
            )
            t.commit(c)
        return base

    def _drain(self, reader):
        """initialOffset -> (latestOffset -> partitions)* until caught
        up; returns the per-batch commit windows."""
        cur = reader.initialOffset()
        windows = []
        for _ in range(20):
            end = reader.latestOffset()
            if end == cur:
                break
            parts = reader.partitions(cur, end)
            windows.append((cur["commit"], end["commit"], len(parts)))
            cur = end
        else:
            raise AssertionError("stream never caught up")
        return windows

    def test_max_commits_bounds_each_batch(self, spark, tmp_path):
        from hudi_rs_spark.sources.pyds import HudiPyStreamReader

        base = self._backlog_table(tmp_path)
        r = HudiPyStreamReader({"path": base, "maxcommitspertrigger": "2"})
        windows = self._drain(r)
        # 5-commit backlog -> 2+2+1, never more than 2 slices per batch
        assert [w[2] for w in windows] == [2, 2, 1]
        assert windows[-1][1] == self.COMMITS[-1]

    def test_max_bytes_bounds_but_always_advances(self, spark, tmp_path):
        from hudi_rs_spark.sources.pyds import HudiPyStreamReader

        base = self._backlog_table(tmp_path)
        # 1 byte budget: every commit exceeds it -> exactly one commit
        # per batch (progress guarantee), never zero
        r = HudiPyStreamReader({"path": base, "maxbytespertrigger": "1"})
        windows = self._drain(r)
        assert [w[2] for w in windows] == [1] * 5
        assert windows[-1][1] == self.COMMITS[-1]

    def test_unbounded_without_options(self, spark, tmp_path):
        from hudi_rs_spark.sources.pyds import HudiPyStreamReader

        base = self._backlog_table(tmp_path)
        r = HudiPyStreamReader({"path": base})
        windows = self._drain(r)
        assert [w[2] for w in windows] == [5]


def test_incremental_across_replacecommit_connector_equals_eager(spark):
    """Incremental windows crossing a clustering replacecommit boundary:
    the connector's startTimestamp/endTimestamp path must match the eager
    read_incremental for every window shape (ending on, starting before,
    and spanning the replacecommit — ref set-difference semantics,
    timeline/mod.rs:382-386)."""
    path = extract_fixture("sample_table/mor/avro/v9_txns_simple_meta.zip")
    t = HudiTable(path, spark)
    stamps = [i.timestamp for i in t.timeline.instants]
    replaces = [i.timestamp for i in t.timeline.instants if i.is_replacecommit]
    assert replaces, "fixture must contain a clustering replacecommit"
    r = replaces[0]
    ri = stamps.index(r)
    windows = {(stamps[i], stamps[i + 1]) for i in range(len(stamps) - 1)}
    windows |= {
        (stamps[max(ri - 1, 0)], r),              # ends ON the replace
        (r, stamps[-1]),                          # starts ON the replace
        (stamps[0], stamps[-1]),                  # spans it
    }
    if ri >= 1:
        windows.add((stamps[ri - 1], stamps[min(ri + 1, len(stamps) - 1)]))
    checked = 0
    for start, end in sorted(windows):
        if start >= end:
            continue
        eager = t.read_incremental(start, end)
        conn = (
            spark.read.format("hudi_py")
            .option("path", path)
            .option("startTimestamp", start)
            .option("endTimestamp", end)
            .load()
        )
        assert _rows(conn) == _rows(eager), f"window ({start}, {end}]"
        checked += 1
    assert checked >= 4


class TestStreamingCdcSource:
    """readStream.format("hudi_py").option("queryType", "cdc"): each
    micro-batch is the typed change feed of its commit window — the
    streaming twin of the batch queryType=cdc path, exactly-once via
    Spark's offset checkpointing."""

    @staticmethod
    def _seed_cdc(spark, base):
        from hudi_rs_spark.write.upsert import delete, upsert

        df = spark.createDataFrame(
            [(i, f"n{i}", 1) for i in range(6)], "id long, name string, ts long"
        )
        (
            df.write.format("hudi_py").option("path", base)
            .option("recordkey.field", "id").option("precombine.field", "ts")
            .option("table.type", "MERGE_ON_READ").option("table.version", "8")
            .option("cdc.enabled", "true")
            .mode("append").save()
        )
        upsert(
            spark.createDataFrame([(1, "u1", 2)], "id long, name string, ts long"),
            base,
        )
        delete(
            spark.createDataFrame([(2, "n2", 3)], "id long, name string, ts long"),
            base,
        )

    @staticmethod
    def _drain(spark, base, out, ckpt):
        import glob
        import time

        df = (
            spark.readStream.format("hudi_py").option("path", base)
            .option("queryType", "cdc").load()
        )
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        deadline = time.time() + 240
        while q.isActive and time.time() < deadline:
            time.sleep(2)
        assert not q.isActive and q.exception() is None
        if not glob.glob(out + "/*.parquet"):
            return []
        return [
            (r.op, r.before, r.after)
            for r in spark.read.parquet(out).collect()
        ]

    def test_stream_feed_matches_batch_feed(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable

        base = str(tmp_path / "t")
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        self._seed_cdc(spark, base)
        got = sorted(self._drain(spark, base, out, ckpt))
        want = sorted(
            (r.op, r.before, r.after)
            for r in HudiTable(base, spark).read_changes(None).collect()
        )
        assert got == want
        ops = [op for op, _, _ in got]
        assert ops.count("i") == 6 and ops.count("u") == 1 and ops.count("d") == 1

    def test_restart_emits_only_new_changes(self, spark, tmp_path):
        from hudi_rs_spark.write.upsert import upsert

        base = str(tmp_path / "t2")
        out, ckpt = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
        self._seed_cdc(spark, base)
        first = self._drain(spark, base, out, ckpt)
        assert len(first) == 8
        upsert(
            spark.createDataFrame([(3, "u3", 4)], "id long, name string, ts long"),
            base,
        )
        second = self._drain(spark, base, out, ckpt)
        assert len(second) == 9  # exactly one new 'u' row, no replay
        assert sorted(op for op, _, _ in second).count("u") == 2
