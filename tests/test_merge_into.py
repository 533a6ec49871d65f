"""MERGE INTO semantics (write/merge_into.py): clause routing, order,
conditional updates, partition-drift safety, and parity with the
equivalent SQL merge computed frame-side.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from hudi_rs_spark.sources.pyds import HudiPyDataSource

    spark.dataSource.register(HudiPyDataSource)


def _write(df, path, mode="append", **options):
    w = df.write.format("hudi_py").option("path", path)
    for k, v in options.items():
        w = w.option(k, v)
    w.mode(mode).save()


OPTS = {
    "recordkey.field": "id", "precombine.field": "ts",
    "partitionpath.field": "part", "table.type": "MERGE_ON_READ",
}


def _seed(spark, tmp_path, n=30):
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"n{i}", i * 10, 1, "a" if i % 2 else "b") for i in range(n)],
        "id long, name string, amount long, ts long, part string",
    )
    _write(df, t, **OPTS)
    return t


def _snap(spark, t):
    from hudi_rs_spark.sources.hudi import HudiTable

    return {
        r.id: (r.name, r.amount, r.part)
        for r in HudiTable(t, spark).read()
        .select("id", "name", "amount", "part").collect()
    }


class TestMergeInto:
    def test_update_delete_insert_all(self, spark, tmp_path):
        from hudi_rs_spark.write import merge_into

        t = _seed(spark, tmp_path)
        src = spark.createDataFrame(
            [
                (1, "U1", 111, 9, "a", "u"),
                (2, "whatever", 0, 9, "b", "d"),
                (100, "NEW", 42, 9, "a", "u"),
            ],
            "id long, name string, amount long, ts long, part string, op string",
        )
        merge_into(
            src, t,
            when_matched_delete="s.op = 'd'",
            when_matched_update="all",
            when_not_matched_insert="all",
        )
        snap = _snap(spark, t)
        assert snap[1] == ("U1", 111, "a")
        assert 2 not in snap
        assert snap[100] == ("NEW", 42, "a")
        assert snap[3] == ("n3", 30, "a")  # untouched rows intact
        assert len(snap) == 30  # 30 - 1 delete + 1 insert

    def test_update_dict_and_condition(self, spark, tmp_path):
        from hudi_rs_spark.write import merge_into

        t = _seed(spark, tmp_path)
        src = spark.createDataFrame(
            [(1, 5, 9), (3, 500, 9)], "id long, bump long, ts long"
        )
        merge_into(
            src, t,
            when_matched_update={"amount": F.expr("t.amount + s.bump")},
            matched_condition="s.bump < 100",
            when_not_matched_insert=None,
        )
        snap = _snap(spark, t)
        assert snap[1] == ("n1", 15, "a")  # 10 + 5, name kept
        assert snap[3] == ("n3", 30, "a")  # gated out: bump too large
        assert len(snap) == 30

    def test_clause_order_delete_beats_update(self, spark, tmp_path):
        from hudi_rs_spark.write import merge_into

        t = _seed(spark, tmp_path)
        src = spark.createDataFrame(
            [(1, "X", 0, 9, "a", "d")],
            "id long, name string, amount long, ts long, part string, op string",
        )
        merge_into(
            src, t,
            when_matched_delete="s.op = 'd'",
            when_matched_update="all",  # must NOT fire for the same row
        )
        assert 1 not in _snap(spark, t)

    def test_partition_drift_routes_to_existing_group(self, spark, tmp_path):
        from hudi_rs_spark.write import merge_into

        t = _seed(spark, tmp_path)
        # id=1 lives in part=a; the source claims part=b — the update
        # must still land on the existing row, not duplicate the key
        src = spark.createDataFrame(
            [(1, "MOVED", 999, 9, "b")],
            "id long, name string, amount long, ts long, part string",
        )
        merge_into(src, t)
        snap = _snap(spark, t)
        assert snap[1] == ("MOVED", 999, "a")  # updated IN PLACE, part kept
        assert len(snap) == 30

    def test_insert_only_and_no_insert(self, spark, tmp_path):
        from hudi_rs_spark.write import merge_into

        t = _seed(spark, tmp_path)
        src = spark.createDataFrame(
            [(1, "X", 0, 9, "a"), (200, "N200", 7, 9, "b")],
            "id long, name string, amount long, ts long, part string",
        )
        merge_into(src, t, when_matched_update=None)  # insert-only merge
        snap = _snap(spark, t)
        assert snap[1] == ("n1", 10, "a")  # matched row untouched
        assert snap[200] == ("N200", 7, "b")
        merge_into(
            spark.createDataFrame(
                [(300, "drop", 0, 9, "a")],
                "id long, name string, amount long, ts long, part string",
            ),
            t, when_not_matched_insert=None,
        )
        assert 300 not in _snap(spark, t)

    def test_missing_join_column_raises(self, spark, tmp_path):
        from hudi_rs_spark.write import merge_into

        t = _seed(spark, tmp_path)
        src = spark.createDataFrame([("x",)], "name string")
        with pytest.raises(ValueError, match="join column"):
            merge_into(src, t)
