"""Table version upgrade/downgrade (write/upgrade.py — Hudi's
UpgradeDowngrade action / CALL upgrade_table): v6 flat timeline ↔ v8
``timeline/`` layout with completion backfill, v8 ↔ v9 property moves.
Snapshot, time travel, and post-change appends must all survive."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hudi_rs_spark.write.upgrade import downgrade_table, upgrade_table
from hudi_rs_spark.write.upsert import upsert


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from hudi_rs_spark.sources.pyds import HudiPyDataSource

    spark.dataSource.register(HudiPyDataSource)


def _seed(spark, path, version, n=20, mdt=False):
    df = spark.createDataFrame(
        [(i, f"n{i}", ["a", "b"][i % 2], 1) for i in range(n)],
        "id int, name string, city string, ts int",
    )
    w = (
        df.write.format("hudi_py").option("path", path)
        .option("recordkey.field", "id")
        .option("precombine.field", "ts")
        .option("table.type", "MERGE_ON_READ")
        .option("table.version", str(version))
    )
    if mdt:
        w = w.option("metadata.enable", "true")
    w.mode("append").save()


def _upd(spark, path, ids, ts=2):
    upsert(
        spark.createDataFrame(
            [(i, f"u{i}", ["a", "b"][i % 2], ts) for i in ids],
            "id int, name string, city string, ts int",
        ),
        path,
    )


def _snap(spark, path):
    return sorted(
        tuple(r)
        for r in spark.read.format("hudi_py").option("path", path).load()
        .select("id", "name").collect()
    )


def _version(path):
    from hudi_rs_spark.config.table_config import HudiTableConfig

    return HudiTableConfig.from_base_path(path).table_version


class TestUpgrade6To8:
    def test_snapshot_time_travel_and_appends_survive(self, spark, tmp_path):
        import os

        from hudi_rs_spark.sources.hudi import HudiTable

        path = str(tmp_path / "t")
        _seed(spark, path, 6)
        _upd(spark, path, [1, 3])
        pre = _snap(spark, path)
        t = HudiTable(path, spark)
        commits = sorted(i.timestamp for i in t.timeline.instants)
        moved = upgrade_table(path, 8)
        assert moved == 2 and _version(path) == 8
        assert os.path.isdir(os.path.join(path, ".hoodie", "timeline"))
        assert _snap(spark, path) == pre
        # time travel to the pre-upsert commit still works
        from hudi_rs_spark.config.read_config import HudiReadOptions

        old = HudiTable(path, spark).read(
            HudiReadOptions(as_of_timestamp=commits[0])
        )
        assert {r.name for r in old.filter(F.col("id") == 1).collect()} == {
            "n1"
        }
        # v8 appends land on the moved timeline
        _upd(spark, path, [5], ts=3)
        assert (5, "u5") in _snap(spark, path)
        assert len(HudiTable(path, spark).timeline.instants) == 3

    def test_upgrade_6_to_9_chains(self, spark, tmp_path):
        from hudi_rs_spark.config.table_config import HudiTableConfig

        path = str(tmp_path / "t")
        _seed(spark, path, 6)
        pre = _snap(spark, path)
        upgrade_table(path, 9)
        tc = HudiTableConfig.from_base_path(path)
        assert tc.table_version == 9
        assert tc.props.get("hoodie.table.format") == "native"
        assert tc.ordering_fields == ["ts"]
        assert _snap(spark, path) == pre


class TestDowngrade:
    def test_8_to_6_roundtrip(self, spark, tmp_path):
        import os

        path = str(tmp_path / "t")
        _seed(spark, path, 8)
        _upd(spark, path, [1])
        pre = _snap(spark, path)
        moved = downgrade_table(path, 6)
        assert moved == 2 and _version(path) == 6
        assert not any(
            e.endswith((".commit", ".deltacommit"))
            for e in os.listdir(os.path.join(path, ".hoodie", "timeline"))
        ) if os.path.isdir(os.path.join(path, ".hoodie", "timeline")) else True
        assert _snap(spark, path) == pre
        _upd(spark, path, [2], ts=3)  # v6 append works
        assert (2, "u2") in _snap(spark, path)

    def test_downgrade_blocked_by_mdt(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path, 8, mdt=True)
        with pytest.raises(ValueError, match="metadata"):
            downgrade_table(path, 6)

    def test_9_to_8_property_move(self, spark, tmp_path):
        from hudi_rs_spark.config.table_config import HudiTableConfig

        path = str(tmp_path / "t")
        _seed(spark, path, 9)
        pre = _snap(spark, path)
        downgrade_table(path, 8)
        tc = HudiTableConfig.from_base_path(path)
        assert tc.table_version == 8
        assert "hoodie.table.format" not in tc.props
        assert tc.ordering_fields == ["ts"]
        assert _snap(spark, path) == pre


class TestGuards:
    def test_noop_and_unsupported(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path, 8)
        assert upgrade_table(path, 8) == 0
        with pytest.raises(ValueError, match="unsupported"):
            upgrade_table(path, 7)

    def test_pending_plan_blocks(self, spark, tmp_path):
        from hudi_rs_spark.write.async_compact import schedule_compaction

        path = str(tmp_path / "t")
        _seed(spark, path, 8)
        _upd(spark, path, [1])
        assert schedule_compaction(path)
        with pytest.raises(ValueError, match="pending"):
            upgrade_table(path, 9)

    def test_call_procedure(self, spark, tmp_path):
        from hudi_rs_spark.write.sql import hudi_sql

        path = str(tmp_path / "t")
        _seed(spark, path, 6)
        pre = _snap(spark, path)
        n = hudi_sql(
            spark, "CALL upgrade_table(table => 't', to_version => 8)",
            tables={"t": path},
        )
        assert n == 1 and _version(path) == 8
        assert _snap(spark, path) == pre
