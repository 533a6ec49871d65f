"""Write-side timestamp-based key generator
(plans/timestamp_keygen.py write twins + write/config.py
hoodie.keygen.timebased.*): the single partition field is a timestamp
SOURCE column and partition paths are its formatted value — completing
the read side, which already prunes filters through the same transform
(tests/test_pruning_stats.py::TestTimestampKeygenPruning).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from hudi_rs_spark.sources.pyds import HudiPyDataSource

    spark.dataSource.register(HudiPyDataSource)


DAY_MS = 24 * 3600 * 1000
T0 = 1700000000000  # 2023-11-14 UTC


def _seed(spark, path, **extra):
    df = spark.createDataFrame(
        [(i, f"n{i}", T0 + (i % 3) * DAY_MS, 1) for i in range(12)],
        "id int, name string, event_ms long, ts int",
    )
    w = (
        df.write.format("hudi_py").option("path", path)
        .option("recordkey.field", "id")
        .option("precombine.field", "ts")
        .option("partitionpath.field", "event_ms")
        .option("hive_style_partitioning", "false")
        .option("table.type", "MERGE_ON_READ")
        .option("table.version", "8")
        .option("keygen.timestamp.type", "EPOCHMILLISECONDS")
        .option("keygen.output.dateformat", "yyyy/MM/dd")
    )
    for k, v in extra.items():
        w = w.option(k, v)
    w.mode("append").save()


def _snap(spark, path, **opts):
    r = spark.read.format("hudi_py").option("path", path)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


class TestEpochMillisKeygen:
    def test_formatted_partition_dirs_and_roundtrip(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        for d in ("2023/11/14", "2023/11/15", "2023/11/16"):
            assert os.path.isdir(os.path.join(path, d)), d
        got = sorted(
            (r.id, r.event_ms)
            for r in _snap(spark, path).select("id", "event_ms").collect()
        )
        assert got == [(i, T0 + (i % 3) * DAY_MS) for i in range(12)]

    def test_props_persisted_for_read_transform(self, spark, tmp_path):
        from hudi_rs_spark.config.table_config import HudiTableConfig
        from hudi_rs_spark.plans.timestamp_keygen import TimestampKeyGen

        path = str(tmp_path / "t")
        _seed(spark, path)
        tc = HudiTableConfig.from_base_path(path)
        kg = TimestampKeyGen.from_config(tc)
        assert kg is not None and kg.output_format == "yyyy/MM/dd"

    def test_filter_on_source_column_prunes_and_matches(self, spark, tmp_path):
        from hudi_rs_spark.config.read_config import HudiReadOptions
        from hudi_rs_spark.plans.partition_pruner import Filter
        from hudi_rs_spark.sources.hudi import HudiTable

        path = str(tmp_path / "t")
        _seed(spark, path)
        # the read-side transform turns the data-column filter into a
        # partition-path filter: only the matching day's slices planned
        t = HudiTable(path, spark)
        slices = t.get_file_slices(
            filters=[Filter(field="event_ms", op="=", value=str(T0))]
        )
        assert {s.partition_path for s in slices} == {"2023/11/14"}
        got = t.read(
            HudiReadOptions(filters=[("event_ms", "=", str(T0))])
        )
        assert sorted(r.id for r in got.collect()) == [0, 3, 6, 9]

    def test_upsert_routes_to_formatted_partition(self, spark, tmp_path):
        from hudi_rs_spark.write.upsert import upsert

        path = str(tmp_path / "t")
        _seed(spark, path)
        upsert(
            spark.createDataFrame(
                [(0, "updated", T0, 2)],
                "id int, name string, event_ms long, ts int",
            ),
            path,
        )
        got = _snap(spark, path).filter(F.col("id") == 0).collect()
        assert len(got) == 1 and got[0].name == "updated"

    def test_bare_append_inherits_keygen(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        more = spark.createDataFrame(
            [(50, "new", T0 + 5 * DAY_MS, 2)],
            "id int, name string, event_ms long, ts int",
        )
        more.write.format("hudi_py").option("path", path).mode("append").save()
        assert os.path.isdir(os.path.join(path, "2023/11/19"))
        assert 50 in {r.id for r in _snap(spark, path).collect()}


class TestDateStringKeygen:
    def test_input_format_parsed(self, spark, tmp_path):
        path = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(1, "a", "2024-02-29 10:00:00", 1), (2, "b", "2024-03-01 11:00:00", 1)],
            "id int, name string, evt string, ts int",
        )
        (
            df.write.format("hudi_py").option("path", path)
            .option("recordkey.field", "id")
            .option("precombine.field", "ts")
            .option("partitionpath.field", "evt")
            .option("hive_style_partitioning", "false")
            .option("table.type", "MERGE_ON_READ")
            .option("table.version", "8")
            .option("keygen.timestamp.type", "DATE_STRING")
            .option("keygen.input.dateformat", "yyyy-MM-dd HH:mm:ss")
            .option("keygen.output.dateformat", "yyyyMMdd")
            .mode("append").save()
        )
        assert os.path.isdir(os.path.join(path, "20240229"))
        assert os.path.isdir(os.path.join(path, "20240301"))
        got = sorted(
            (r.id, r.evt)
            for r in spark.read.format("hudi_py").option("path", path)
            .load().select("id", "evt").collect()
        )
        assert got == [(1, "2024-02-29 10:00:00"), (2, "2024-03-01 11:00:00")]


class TestValidation:
    def test_multi_field_rejected(self, spark, tmp_path):
        path = str(tmp_path / "t")
        df = spark.createDataFrame([(1, 1, 2, 1)], "id int, a long, b long, ts int")
        with pytest.raises(Exception, match="ONE source field"):
            (
                df.write.format("hudi_py").option("path", path)
                .option("recordkey.field", "id")
                .option("precombine.field", "ts")
                .option("partitionpath.field", "a,b")
                .option("keygen.timestamp.type", "EPOCHMILLISECONDS")
                .option("keygen.output.dateformat", "yyyy/MM/dd")
                .mode("append").save()
            )

    def test_millis_output_rejected(self, spark, tmp_path):
        path = str(tmp_path / "t")
        df = spark.createDataFrame([(1, 5, 1)], "id int, a long, ts int")
        with pytest.raises(Exception, match="SSS"):
            (
                df.write.format("hudi_py").option("path", path)
                .option("recordkey.field", "id")
                .option("precombine.field", "ts")
                .option("partitionpath.field", "a")
                .option("keygen.timestamp.type", "EPOCHMILLISECONDS")
                .option("keygen.output.dateformat", "yyyyMMddHHmmssSSS")
                .mode("append").save()
            )
