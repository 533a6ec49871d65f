"""Compaction plan strategies (write/compact_strategy.py): IO-bounded
and freshness-bounded slice selection for compaction rounds — Hudi's
hoodie.compaction.strategy family."""

from __future__ import annotations

import pytest

from hudi_rs_spark.fs.file_group import BaseFile, FileSlice, LogFile
from hudi_rs_spark.write.compact_strategy import (
    normalize_strategy,
    select_compaction_slices,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from hudi_rs_spark.sources.pyds import HudiPyDataSource

    spark.dataSource.register(HudiPyDataSource)


MB = 1024 * 1024


def _slice(fid, part, base_mb, log_mbs):
    base = BaseFile(
        file_id=fid, write_token="0-0-0", commit_timestamp="1",
        extension="parquet", file_name=f"{fid}_0-0-0_1.parquet",
        size=int(base_mb * MB),
    )
    logs = [
        LogFile(
            file_id=fid, timestamp="1", extension="log", version=i + 1,
            write_token="0-0-0", file_name=f".{fid}_1.log.{i + 1}_0-0-0",
            size=int(m * MB),
        )
        for i, m in enumerate(log_mbs)
    ]
    return FileSlice(base_file=base, partition_path=part, log_files=logs)


class TestSelection:
    def test_normalize_accepts_hudi_class_names(self):
        assert normalize_strategy(
            "org.apache.hudi.table.action.compact.strategy."
            "LogFileSizeBasedCompactionStrategy"
        ) == "log_file_size"
        assert normalize_strategy("BoundedIOCompactionStrategy") == "bounded_io"
        with pytest.raises(ValueError, match="strategy"):
            normalize_strategy("YoloStrategy")

    def test_log_file_size_orders_and_caps(self):
        slices = [
            _slice("a", "p", 10, [1]),     # io = 22 MB, logs 1
            _slice("b", "p", 10, [8, 8]),  # io = 52 MB, logs 16
            _slice("c", "p", 10, [4]),     # io = 28 MB, logs 4
        ]
        # budget fits b (52) + c (28) but not a afterwards
        got = select_compaction_slices(
            slices, "log_file_size", target_io_mb=85
        )
        assert [s.file_id for s in got] == ["b", "c"]

    def test_log_file_size_skips_to_smaller_fit(self):
        slices = [
            _slice("big", "p", 10, [30]),   # io = 80
            _slice("small", "p", 1, [1]),   # io = 4
        ]
        got = select_compaction_slices(
            slices, "log_file_size", target_io_mb=85
        )
        # big first (most logs), small still fits in the remainder
        assert [s.file_id for s in got] == ["big", "small"]

    def test_bounded_io_preserves_order_and_stops(self):
        slices = [
            _slice("a", "p", 10, [1]),   # 22
            _slice("b", "p", 10, [20]),  # 60
            _slice("c", "p", 1, [1]),    # 4
        ]
        got = select_compaction_slices(slices, "bounded_io", target_io_mb=30)
        assert [s.file_id for s in got] == ["a"]  # b busts, stop (no skip)

    def test_budget_always_admits_one(self):
        slices = [_slice("huge", "p", 500, [500])]
        got = select_compaction_slices(
            slices, "log_file_size", target_io_mb=1
        )
        assert [s.file_id for s in got] == ["huge"]

    def test_day_based_latest_partitions(self):
        slices = [
            _slice("a", "dt=2024-01-01", 1, [1]),
            _slice("b", "dt=2024-01-02", 1, [1]),
            _slice("c", "dt=2024-01-03", 1, [1]),
        ]
        got = select_compaction_slices(
            slices, "day_based", target_partitions=2
        )
        assert {s.partition_path for s in got} == {
            "dt=2024-01-02", "dt=2024-01-03"
        }

    def test_io_bounded_requires_budget(self):
        with pytest.raises(ValueError, match="target_io_mb"):
            select_compaction_slices([_slice("a", "p", 1, [1])], "bounded_io")


def _seed(spark, path):
    df = spark.createDataFrame(
        [(i, f"n{i}", ["2024-01-01", "2024-01-02"][i % 2], 1)
         for i in range(40)],
        "id int, name string, dt string, ts int",
    )
    (
        df.repartition(2).write.format("hudi_py").option("path", path)
        .option("recordkey.field", "id")
        .option("precombine.field", "ts")
        .option("partitionpath.field", "dt")
        .option("table.type", "MERGE_ON_READ")
        .option("table.version", "8")
        .mode("append").save()
    )


def _dirty(spark, path, ids, ts=2):
    from hudi_rs_spark.write.upsert import upsert

    upsert(
        spark.createDataFrame(
            [(i, f"u{i}", ["2024-01-01", "2024-01-02"][i % 2], ts)
             for i in ids],
            "id int, name string, dt string, ts int",
        ),
        path,
    )


def _snap(spark, path):
    return sorted(
        tuple(r)
        for r in spark.read.format("hudi_py").option("path", path).load()
        .select("id", "name").collect()
    )


class TestEndToEnd:
    def test_day_based_compacts_latest_partition_only(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable
        from hudi_rs_spark.write.compact import compact

        path = str(tmp_path / "t")
        _seed(spark, path)
        _dirty(spark, path, range(0, 10))  # both partitions get logs
        pre = _snap(spark, path)
        n1 = compact(spark, path, strategy="day_based", target_partitions=1)
        assert n1 > 0
        assert _snap(spark, path) == pre
        # the older partition still has logs; an unbounded round finds them
        dirty_parts = {
            sl.partition_path
            for sl in HudiTable(path, spark).get_file_slices()
            if sl.log_files
        }
        assert dirty_parts == {"dt=2024-01-01"}
        assert compact(spark, path) > 0
        assert _snap(spark, path) == pre

    def test_bounded_round_then_finish(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable
        from hudi_rs_spark.write.compact import compact

        path = str(tmp_path / "t")
        _seed(spark, path)
        _dirty(spark, path, range(0, 10))
        pre = _snap(spark, path)
        total_dirty = sum(
            1 for sl in HudiTable(path, spark).get_file_slices()
            if sl.log_files
        )
        n1 = compact(spark, path, strategy="log_file_size", target_io_mb=1e-4)
        assert 1 <= n1 < total_dirty  # budget admits one, not all
        assert _snap(spark, path) == pre
        assert compact(spark, path) == total_dirty - n1
        assert _snap(spark, path) == pre

    def test_scheduled_plan_respects_strategy(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable
        from hudi_rs_spark.write.async_compact import (
            run_scheduled_compaction,
            schedule_compaction,
        )

        path = str(tmp_path / "t")
        _seed(spark, path)
        _dirty(spark, path, range(0, 10))
        pre = _snap(spark, path)
        plan = schedule_compaction(
            path, strategy="day_based", target_partitions=1
        )
        assert plan is not None
        t = HudiTable(path, spark)
        plans = t.timeline.pending_compaction_plans()
        assert {g["partition"] for g in plans[plan]["groups"]} == {
            "dt=2024-01-02"
        }
        assert run_scheduled_compaction(spark, path) > 0
        assert _snap(spark, path) == pre

    def test_call_procedure_passthrough(self, spark, tmp_path):
        from hudi_rs_spark.write.sql import hudi_sql

        path = str(tmp_path / "t")
        _seed(spark, path)
        _dirty(spark, path, range(0, 10))
        pre = _snap(spark, path)
        n = hudi_sql(
            spark,
            "CALL run_compaction(table => 't', strategy => 'day_based', "
            "target_partitions => 1)",
            tables={"t": path},
        )
        assert n > 0
        assert _snap(spark, path) == pre
