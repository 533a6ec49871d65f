"""Regression tests for the round-5 ADVICE findings.

1. (medium) connector incremental reads gate PRE-WINDOW log blocks out
   before the slice merge (pyds._decode_logs start_exclusive), matching
   the eager path — otherwise a pre-window row with a higher ordering
   value wins the merge and the post-merge window drops the key.
2. asof_join fills the payload as ONE struct: a legitimate NULL in one
   payload column must not be back-filled from an older right row.
3. partition-column filters stay in the residual when path-restore
   succeeded: the pruner fails open on uncomparable values, so pruning
   alone may not have enforced them.
4. IN pushdown carries values typed — whitespace survives exactly.
5. CDC reads are planned from commit-metadata write stats, so a
   compaction inside the window cannot truncate the change feed.
"""

from __future__ import annotations

import json
import os

import pytest

from hudi_rs_spark.sources.hudi import HudiTable
from tests.synth import SynthTable, cdc_block, parquet_data_block

C1 = "20240101000000000"
C2 = "20240102000000000"
C3 = "20240103000000000"


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from hudi_rs_spark.sources.pyds import HudiPyDataSource

    spark.dataSource.register(HudiPyDataSource)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(map(tuple, df.select(*cols).collect()))


def test_connector_incremental_excludes_pre_window_logs(spark, tmp_path):
    """k1: base@C1(ts=100), log@C2(ts=500, HIGHER ordering), log@C3
    (ts=300). Window (C2, C3] must surface the C3 change — merging the
    C2 row in (pre-fix connector) lets it win the slice merge and the
    post-merge window then drops the key entirely."""
    base = os.path.join(tmp_path, "tbl")
    t = SynthTable(base)
    t.write_base("g1-0", C1, {"id": ["k1"], "ts": [100], "val": ["base"]}, ["k1"])
    t.commit(C1)
    t.append_log(
        "g1-0", C1,
        parquet_data_block(
            C2, t.log_rows(C2, {"id": ["k1"], "ts": [500], "val": ["early-high"]},
                           ["k1"], "log")),
        stats_instant=C2,
    )
    t.commit(C2)
    t.append_log(
        "g1-0", C1,
        parquet_data_block(
            C3, t.log_rows(C3, {"id": ["k1"], "ts": [300], "val": ["late-change"]},
                           ["k1"], "log")),
        version=2, stats_instant=C3,
    )
    t.commit(C3)

    eager = HudiTable(base, spark).read_incremental(C2, C3)
    assert [(r["id"], r["val"]) for r in eager.collect()] == [("k1", "late-change")]

    conn = (
        spark.read.format("hudi_py")
        .option("path", base)
        .option("startTimestamp", C2)
        .option("endTimestamp", C3)
        .load()
    )
    assert _rows(conn) == _rows(eager)


def test_asof_join_null_payload_not_backfilled(spark):
    """The latest right row carries b=NULL; per-column fill would graft
    b from the OLDER row onto it — the struct fill must not."""
    from hudi_rs_spark.operators.temporal import asof_join

    left = spark.createDataFrame([("k", 3, "L")], "k string, t int, lv string")
    right = spark.createDataFrame(
        [("k", 1, "x", "old-b"), ("k", 2, "y", None)],
        "k string, t int, a string, b string",
    )
    out = asof_join(left, right, "k", "t", "t", ["a", "b"]).collect()
    assert len(out) == 1
    assert (out[0]["a"], out[0]["b"]) == ("y", None)
    # and a left row before any right row still gets all-null payload
    left2 = spark.createDataFrame([("k", 0, "L")], "k string, t int, lv string")
    out2 = asof_join(left2, right, "k", "t", "t", ["a", "b"]).collect()
    assert (out2[0]["a"], out2[0]["b"]) == (None, None)


def test_partition_filter_enforced_when_pruner_fails_open(spark, tmp_path):
    """Typed partition column (long) + uncomparable filter value: the
    pruner fails open (keeps every file), so the restored residual must
    still evaluate the filter — stripping it returned every row."""
    from hudi_rs_spark.config.read_config import HudiReadOptions
    from tests.synth import avro_schema

    props = {
        "hoodie.table.partition.fields": "num",
        "hoodie.datasource.write.drop.partition.columns": "true",
        "hoodie.datasource.write.hive_style_partitioning": "true",
    }
    schema = avro_schema(
        [("id", "string"), ("ts", "long"), ("val", "string"), ("num", "long")]
    )
    t = SynthTable(os.path.join(tmp_path, "tbl"), extra_props=props)
    t.write_base("g1-0", C1, {"id": ["a"], "ts": [1], "val": ["v1"]}, ["a"],
                 partition="num=7")
    t.write_base("g2-0", C1, {"id": ["b"], "ts": [1], "val": ["v2"]}, ["b"],
                 partition="num=8")
    t.commit(C1, schema=schema)

    table = HudiTable(t.base_path, spark)
    # sanity: a comparable value prunes AND filters exactly
    ok = table.read(HudiReadOptions(filters=[("num", "=", "7")]))
    assert [(r["id"], r["num"]) for r in ok.collect()] == [("a", 7)]
    # uncomparable value: pruning fails open (keeps both files), and the
    # residual filter now evaluates — under ANSI that raises, exactly as
    # the same filter on a non-partition long column does. Pre-fix the
    # filter was stripped and every row came back silently.
    with pytest.raises(Exception, match="CAST_INVALID_INPUT|cannot be cast"):
        table.read(HudiReadOptions(filters=[("num", "=", "abc")])).collect()


def test_in_pushdown_values_travel_typed():
    """IN values with leading/trailing whitespace and separator-adjacent
    escapes survive the pushFilters round-trip exactly."""
    from pyspark.sql.datasource import EqualTo, In

    from hudi_rs_spark.sources.pyds import HudiPyDataSource, HudiPyReader

    reader = HudiPyReader.__new__(HudiPyReader)
    reader.filters = []
    vals = (" padded ", "a,b", "trailing\\", "plain")
    unsupported = list(
        HudiPyReader.pushFilters(
            reader, [In(("region",), vals), EqualTo(("id",), "x")]
        )
    )
    assert len(unsupported) == 2  # everything re-applied by Spark post-scan
    in_f = next(f for f in reader.filters if f.op == "IN")
    assert in_f.values() == list(vals)


def test_cdc_feed_survives_compaction_in_window(spark, tmp_path):
    """CDC blocks written before an in-window compaction: the as-of
    slice view no longer lists the pre-compaction log, but the commit
    metadata does — read_changes and the connector cdc path must still
    surface the change rows."""
    base = os.path.join(tmp_path, "tbl")
    t = SynthTable(base)
    t.write_base("g1-0", C1, {"id": ["k1"], "ts": [1], "val": ["v1"]}, ["k1"])
    t.commit(C1)
    change = {
        "op": "u",
        "ts_ms": "1704153600000",
        "before": json.dumps({"id": "k1", "val": "v1"}),
        "after": json.dumps({"id": "k1", "val": "v2"}),
    }
    t.append_log("g1-0", C1, cdc_block(C2, [change]), stats_instant=C2)
    t.commit(C2)
    # compaction at C3: fresh base for the same file group, logs absorbed
    t.write_base("g1-0", C3, {"id": ["k1"], "ts": [2], "val": ["v2"]}, ["k1"])
    t.commit(C3, action="commit")

    table = HudiTable(base, spark)
    # slice view as-of C3 has no log files -> old planner saw nothing
    assert all(
        not s.has_log_files for s in table.get_file_slices(C3)
    )
    feed = table.read_changes(C1, C3).collect()
    assert len(feed) == 1
    assert feed[0]["op"] == "u" and feed[0]["commit_time"] == C2

    conn = (
        spark.read.format("hudi_py")
        .option("path", base)
        .option("queryType", "cdc")
        .option("startTimestamp", C1)
        .option("endTimestamp", C3)
        .load()
    )
    assert [(r["commit_time"], r["op"]) for r in conn.collect()] == [(C2, "u")]
