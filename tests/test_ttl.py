"""Partition TTL (write/ttl.py): expiry by newest-file instant, the
deterministic latest-instant epoch, recent-touch rescue, and the
delete_partition composition.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from hudi_rs_spark.sources.pyds import HudiPyDataSource

    spark.dataSource.register(HudiPyDataSource)


OPTS = {
    "recordkey.field": "id",
    "precombine.field": "ts",
    "partitionpath.field": "part",
    "table.type": "MERGE_ON_READ",
}

OLD = "20240101000000000"
MID = "20240215000000000"
NEW = "20240301000000000"


def _write(spark, t, part, instant, start=0):
    df = spark.createDataFrame(
        [(start + i, 1, part) for i in range(5)],
        "id long, ts long, part string",
    )
    w = df.write.format("hudi_py").option("path", t).option("instant", instant)
    for k, v in OPTS.items():
        w = w.option(k, v)
    w.mode("append").save()


class TestPartitionTtl:
    def test_expiry_by_newest_instant(self, spark, tmp_path):
        from hudi_rs_spark.write.ttl import expired_partitions

        t = str(tmp_path / "t")
        _write(spark, t, "a", OLD, 0)
        _write(spark, t, "b", NEW, 100)
        # epoch defaults to the latest completed instant (NEW = Mar 1):
        # 30 days back -> Jan 31 boundary -> only part=a expired
        assert expired_partitions(t, 30) == ["part=a"]
        assert expired_partitions(t, 90) == []
        # explicit as_of overrides the epoch
        assert expired_partitions(t, 30, as_of=MID) == ["part=a"]

    def test_recent_touch_rescues_partition(self, spark, tmp_path):
        from hudi_rs_spark.write.ttl import expired_partitions
        from hudi_rs_spark.write.upsert import upsert

        t = str(tmp_path / "t")
        _write(spark, t, "a", OLD, 0)
        _write(spark, t, "b", NEW, 100)
        # a log append to part=a at NEW-era refreshes its newest instant
        upsert(
            spark.createDataFrame([(1, 2, "a")], "id long, ts long, part string"),
            t,
            instant="20240301000000500",
        )
        assert expired_partitions(t, 30, as_of=NEW) == []

    def test_apply_drops_and_preserves_history(self, spark, tmp_path):
        from hudi_rs_spark.config.read_config import HudiReadOptions
        from hudi_rs_spark.sources.hudi import HudiTable
        from hudi_rs_spark.write.ttl import apply_partition_ttl

        t = str(tmp_path / "t")
        _write(spark, t, "a", OLD, 0)
        _write(spark, t, "b", NEW, 100)
        assert apply_partition_ttl(t, 30) == ["part=a"]
        snap = HudiTable(t, spark).read()
        assert {r.part for r in snap.select("part").distinct().collect()} == {"b"}
        # time travel before the TTL replacecommit still sees part=a
        tt = HudiTable(t, spark).read(HudiReadOptions(as_of_timestamp=NEW))
        assert {r.part for r in tt.select("part").distinct().collect()} == {
            "a", "b",
        }
        # idempotent: nothing left to expire
        assert apply_partition_ttl(t, 30) == []

    def test_unpartitioned_table_never_expires(self, spark, tmp_path):
        from hudi_rs_spark.write.ttl import expired_partitions

        t = str(tmp_path / "t")
        df = spark.createDataFrame([(1, 1)], "id long, ts long")
        (
            df.write.format("hudi_py").option("path", t)
            .option("recordkey.field", "id").option("instant", OLD)
            .mode("append").save()
        )
        assert expired_partitions(t, 1) == []


class TestRunTtlProcedure:
    def test_call_matches_api(self, spark, tmp_path):
        from hudi_rs_spark.write.sql import SqlDmlError, hudi_sql

        t = str(tmp_path / "t")
        _write(spark, t, "a", OLD, 0)
        _write(spark, t, "b", NEW, 100)
        out = hudi_sql(
            spark, "CALL run_ttl(table => 't', retain_days => 30)",
            tables={"t": t},
        ).collect()
        assert [r["dropped_partition"] for r in out] == ["part=a"]
        # idempotent: nothing left to expire
        assert hudi_sql(
            spark, "CALL run_ttl(table => 't', retain_days => 30)",
            tables={"t": t},
        ).count() == 0
        got = (
            spark.read.format("hudi_py").option("path", t).load()
            .select("part").distinct().collect()
        )
        assert [r["part"] for r in got] == ["b"]
        import pytest as _pytest

        with _pytest.raises(SqlDmlError, match="retain_days"):
            hudi_sql(spark, "CALL run_ttl(table => 't')", tables={"t": t})


class TestInlineTtl:
    def test_property_driven_expiry_after_write(self, spark, tmp_path):
        from hudi_rs_spark.write.sql import hudi_sql
        from hudi_rs_spark.write.upsert import upsert

        t = str(tmp_path / "t")
        _write(spark, t, "a", OLD, 0)  # 2024 partition: long expired
        hudi_sql(
            spark,
            "ALTER TABLE t SET TBLPROPERTIES ("
            "'hoodie.partition.ttl.inline.enabled' = 'true', "
            "'hoodie.partition.ttl.days.retained' = '30')",
            tables={"t": t},
        )
        # a normal write commits at the CURRENT instant -> the epoch
        # advances -> inline TTL fires and drops the stale partition
        upsert(
            spark.createDataFrame(
                [(200, 1, "b")], "id long, ts long, part string"
            ),
            t,
        )
        got = (
            spark.read.format("hudi_py").option("path", t).load()
            .select("part").distinct().collect()
        )
        assert [r["part"] for r in got] == ["b"]

    def test_disabled_without_property(self, spark, tmp_path):
        from hudi_rs_spark.write.upsert import upsert

        t = str(tmp_path / "t")
        _write(spark, t, "a", OLD, 0)
        upsert(
            spark.createDataFrame(
                [(200, 1, "b")], "id long, ts long, part string"
            ),
            t,
        )
        got = (
            spark.read.format("hudi_py").option("path", t).load()
            .select("part").distinct().collect()
        )
        assert sorted(r["part"] for r in got) == ["a", "b"]


class TestCreationTimePolicy:
    def test_recent_touch_does_not_rescue(self, spark, tmp_path):
        from hudi_rs_spark.write.ttl import expired_partitions
        from hudi_rs_spark.write.upsert import upsert

        t = str(tmp_path / "t")
        _write(spark, t, "a", OLD, 0)   # born Jan 1
        _write(spark, t, "b", NEW, 100)  # born Mar 1
        # touch part=a at NEW-era: rescues it under KEEP_BY_TIME...
        upsert(
            spark.createDataFrame(
                [(1, 2, "a")], "id long, ts long, part string"
            ),
            t,
            instant="20240301000000500",
        )
        assert expired_partitions(t, 30, as_of=NEW) == []
        # ...but NOT under KEEP_BY_CREATION_TIME (birth decides)
        assert expired_partitions(
            t, 30, as_of=NEW, policy="KEEP_BY_CREATION_TIME"
        ) == ["part=a"]
        assert expired_partitions(
            t, 90, as_of=NEW, policy="KEEP_BY_CREATION_TIME"
        ) == []

    def test_unknown_policy_rejected(self, spark, tmp_path):
        from hudi_rs_spark.write.ttl import expired_partitions

        t = str(tmp_path / "t")
        _write(spark, t, "a", OLD, 0)
        with pytest.raises(ValueError, match="TTL policy"):
            expired_partitions(t, 30, policy="KEEP_FOREVER")
