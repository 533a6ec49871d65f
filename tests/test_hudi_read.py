"""Hudi-format reader tests against the reference's golden fixtures
(real Hudi tables written by Hudi/Spark; expected values pinned by the
reference's own test suite — crates/core/tests/table_read_tests.rs and
python/tests/test_table_read.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hudi_rs_spark import HudiReadOptions, HudiTable
from tests.conftest import extract_fixture


class TestV8TripsMor:
    """v8_trips_8i3u1d: MOR, hive-style partitioned by city; 8 inserts,
    UPDATE rider-A fare=0, DELETE rider-F, UPDATE rider-J fare=0,
    DELETE rider-J, UPDATE rider-G fare=0 -> 6 surviving rows
    (python/tests/test_table_read.py:19-23)."""

    def test_schema_has_meta_fields(self, spark, v8_trips_table):
        t = HudiTable(v8_trips_table, spark)
        names = t.get_schema().fieldNames()
        assert names[:5] == [
            "_hoodie_commit_time",
            "_hoodie_commit_seqno",
            "_hoodie_record_key",
            "_hoodie_partition_path",
            "_hoodie_file_name",
        ]
        assert names[5:] == ["ts", "uuid", "rider", "driver", "fare", "city"]

    def test_partition_schema(self, spark, v8_trips_table):
        t = HudiTable(v8_trips_table, spark)
        assert [n for n, _ in t.get_partition_schema()] == ["city"]

    def test_file_slices(self, spark, v8_trips_table):
        t = HudiTable(v8_trips_table, spark)
        slices = t.get_file_slices()
        assert len(slices) == 3
        parts = sorted(s.partition_path for s in slices)
        assert parts == ["city=chennai", "city=san_francisco", "city=sao_paulo"]

    def test_snapshot_merge(self, spark, v8_trips_table):
        t = HudiTable(v8_trips_table, spark)
        rows = t.read().select("rider", "fare", "uuid").collect()
        fares = {r["rider"]: r["fare"] for r in rows}
        assert fares == {
            "rider-D": 33.9,
            "rider-C": 27.7,
            "rider-A": 0.0,  # updated
            "rider-I": 41.06,
            "rider-E": 93.5,
            "rider-G": 0.0,  # updated
        }
        uuids = {r["uuid"]: r["rider"] for r in rows}
        assert uuids["334e26e9-8355-45cc-97c6-c31daf0df330"] == "rider-A"

    def test_read_optimized_skips_logs(self, spark, v8_trips_table):
        t = HudiTable(v8_trips_table, spark)
        ro = t.read(HudiReadOptions(use_read_optimized_mode=True))
        # read-optimized sees base files only (config/read.rs:97-99);
        # the last deltacommit (UPDATE rider-G) lives only in a log file
        fares = {r["rider"]: r["fare"] for r in ro.select("rider", "fare").collect()}
        assert fares["rider-G"] != 0.0

    def test_partition_filter_pruning(self, spark, v8_trips_table):
        t = HudiTable(v8_trips_table, spark)
        slices = t.get_file_slices(filters=_filters([("city", "=", "san_francisco")]))
        assert len(slices) == 1
        assert slices[0].partition_path == "city=san_francisco"

    def test_read_with_filter_and_projection(self, spark, v8_trips_table):
        t = HudiTable(v8_trips_table, spark)
        df = t.read(
            HudiReadOptions(
                filters=[("city", "=", "san_francisco")],
                projection=["rider", "fare", "city"],
            )
        )
        assert df.columns == ["rider", "fare", "city"]
        assert all(r["city"] == "san_francisco" for r in df.collect())


class TestV6Cow:
    def test_snapshot(self, spark, v6_cow_nonhive):
        t = HudiTable(v6_cow_nonhive, spark)
        df = t.read()
        assert df.count() == 4
        keys = {r["_hoodie_record_key"] for r in df.collect()}
        assert keys == {"1", "2", "3", "4"}

    def test_time_travel_first_commit(self, spark, v6_cow_nonhive):
        t = HudiTable(v6_cow_nonhive, spark)
        commits = [i.timestamp for i in t.timeline.instants]
        assert len(commits) == 2
        df = t.read(HudiReadOptions(as_of_timestamp=commits[0]))
        # first commit wrote the initial rows; second commit upserted
        assert df.count() > 0
        assert set(df.select("_hoodie_commit_time").distinct().toPandas()["_hoodie_commit_time"]) == {
            commits[0]
        }

    def test_incremental_second_commit_only(self, spark, v6_cow_nonhive):
        t = HudiTable(v6_cow_nonhive, spark)
        commits = [i.timestamp for i in t.timeline.instants]
        df = t.read_incremental(commits[0], commits[1])
        rows = df.select("_hoodie_commit_time").distinct().collect()
        assert {r[0] for r in rows} == {commits[1]}

    def test_incremental_full_range_equals_snapshot_keys(self, spark, v6_cow_nonhive):
        t = HudiTable(v6_cow_nonhive, spark)
        inc = t.read_incremental(None, None)
        snap = t.read()
        assert sorted(r[0] for r in inc.select("_hoodie_record_key").collect()) == sorted(
            r[0] for r in snap.select("_hoodie_record_key").collect()
        )


class TestMorParquetLogs:
    def test_v6_mor_parquet_log_snapshot(self, spark):
        path = extract_fixture("sample_table/mor/parquet/v6_nonpartitioned.zip")
        t = HudiTable(path, spark)
        df = t.read()
        assert df.count() == 4

    def test_v6_mor_rollback_voids_blocks(self, spark):
        """Pinned by table_read_tests.rs test_non_partitioned_rollback:
        Alice updated->rolled back (stays true), Bob updated after the
        rollback, Carol untouched."""
        path = extract_fixture("sample_table/mor/parquet/v6_nonpartitioned_rollback.zip")
        t = HudiTable(path, spark)
        rows = t.read().select("id", "name", "isActive").orderBy("id").collect()
        assert [(r["id"], r["name"], r["isActive"]) for r in rows] == [
            (1, "Alice", True),
            (2, "Bob", True),
            (3, "Carol", True),
        ]


class TestReplaceCommit:
    def test_insert_overwrite_excludes_replaced_groups(self, spark):
        path = extract_fixture("sample_table/cow/v6_simplekeygen_nonhivestyle_overwritetable.zip")
        t = HudiTable(path, spark)
        replaced = t.timeline.replaced_file_group_ids_as_of(None)
        assert replaced  # the overwrite must have replaced groups
        df = t.read()
        live_files = {r[0] for r in df.select("_hoodie_file_name").distinct().collect()}
        for fid in replaced:
            assert not any(fid in f for f in live_files)


class TestEmptyTable:
    def test_empty_read_returns_empty_not_error(self, spark):
        # reader-spec.md:321-323
        path = extract_fixture("sample_table/cow/v6_empty.zip")
        t = HudiTable(path, spark)
        df = t.read()
        assert df.count() == 0
        assert "_hoodie_record_key" in df.columns


def _filters(triples):
    from hudi_rs_spark.plans.partition_pruner import Filter

    return [Filter(*t) for t in triples]
