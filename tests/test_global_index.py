"""Global index semantics (write/upsert.py, Hudi's GLOBAL_* indexes /
record-index globality): ``index.global=true`` tags by KEY ONLY, so a
key that arrives with a new partition value is still found at its
original location. Drift handling follows
``hoodie.record.index.update.partition.path``: false (Hudi default) =
the update lands in the record's ORIGINAL partition; true = tombstone
old + insert new (the record moves). Without the flag, tagging stays
(key, partition)-scoped and a drifted key duplicates — also pinned
here, because that is the documented non-global contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hudi_rs_spark.write.upsert import delete, upsert


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from hudi_rs_spark.sources.pyds import HudiPyDataSource

    spark.dataSource.register(HudiPyDataSource)


def _seed(spark, path, record_index=False):
    df = spark.createDataFrame(
        [(i, f"n{i}", ["a", "b"][i % 2], 1) for i in range(10)],
        "id int, name string, city string, ts int",
    )
    w = (
        df.write.format("hudi_py").option("path", path)
        .option("recordkey.field", "id")
        .option("precombine.field", "ts")
        .option("partitionpath.field", "city")
        .option("table.type", "MERGE_ON_READ")
        .option("table.version", "8")
    )
    if record_index:
        w = (
            w.option("metadata.enable", "true")
            .option("metadata.recordindex.enable", "true")
        )
    w.mode("append").save()


def _drift(spark, path, **opts):
    # id=0 lives in city=a; the update claims city=b
    upsert(
        spark.createDataFrame(
            [(0, "moved", "b", 2)], "id int, name string, city string, ts int"
        ),
        path,
        **opts,
    )


def _rows(spark, path, key=0):
    return sorted(
        tuple(r)
        for r in spark.read.format("hudi_py").option("path", path).load()
        .filter(F.col("id") == key).select("id", "name", "city").collect()
    )


class TestGlobalIndex:
    def test_non_global_drift_duplicates(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        _drift(spark, path)
        # partition-scoped tagging: the key now exists in BOTH partitions
        assert _rows(spark, path) == [(0, "moved", "b"), (0, "n0", "a")]

    def test_global_update_stays_in_original_partition(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        _drift(spark, path, **{"index.global": "true"})
        assert _rows(spark, path) == [(0, "moved", "a")]

    def test_global_update_partition_path_moves_record(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        _drift(
            spark, path,
            **{"index.global": "true", "update.partition.path": "true"},
        )
        assert _rows(spark, path) == [(0, "moved", "b")]
        total = (
            spark.read.format("hudi_py").option("path", path).load().count()
        )
        assert total == 10  # moved, not duplicated; nothing else lost

    def test_global_through_record_index_tier(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path, record_index=True)
        _drift(
            spark, path,
            **{"index.global": "true", "update.partition.path": "true"},
        )
        assert _rows(spark, path) == [(0, "moved", "b")]

    def test_global_insert_of_new_key(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        upsert(
            spark.createDataFrame(
                [(77, "new", "b", 2)],
                "id int, name string, city string, ts int",
            ),
            path,
            **{"index.global": "true"},
        )
        assert _rows(spark, path, key=77) == [(77, "new", "b")]

    def test_global_delete_without_knowing_partition(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        # id=0 lives in city=a; the delete frame claims city=b — a
        # global tombstone still lands on the record's real group
        delete(
            spark.createDataFrame(
                [(0, "b", 2)], "id int, city string, ts int"
            ),
            path,
            **{"index.global": "true"},
        )
        assert _rows(spark, path) == []
        assert (
            spark.read.format("hudi_py").option("path", path).load().count()
            == 9
        )

    def test_bucket_table_rejects_global(self, spark, tmp_path):
        path = str(tmp_path / "t")
        upsert(
            spark.createDataFrame(
                [(1, "n1", "a", 1)], "id int, name string, city string, ts int"
            ),
            path,
            **{
                "recordkey.field": "id", "precombine.field": "ts",
                "partitionpath.field": "city",
                "table.type": "MERGE_ON_READ", "table.version": "8",
                "index.type": "bucket",
                "hoodie.bucket.index.num.buckets": "4",
                "hoodie.table.name": "b",
            },
        )
        with pytest.raises(ValueError, match="bucket"):
            _drift(spark, path, **{"index.global": "true"})

    def test_typed_partition_column_cast_back(self, spark, tmp_path):
        path = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(i, f"n{i}", i % 2, 1) for i in range(6)],
            "id int, name string, bucket int, ts int",
        )
        (
            df.write.format("hudi_py").option("path", path)
            .option("recordkey.field", "id")
            .option("precombine.field", "ts")
            .option("partitionpath.field", "bucket")
            .option("table.type", "MERGE_ON_READ")
            .option("table.version", "8")
            .mode("append").save()
        )
        upsert(
            spark.createDataFrame(
                [(0, "moved", 1, 2)], "id int, name string, bucket int, ts int"
            ),
            path,
            **{"index.global": "true"},
        )
        got = [
            tuple(r)
            for r in spark.read.format("hudi_py").option("path", path).load()
            .filter(F.col("id") == 0).select("id", "name", "bucket").collect()
        ]
        assert got == [(0, "moved", 0)]  # int partition value restored
