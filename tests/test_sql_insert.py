"""SQL INSERT INTO / INSERT OVERWRITE against hudi_py temp views, and
the table-identity inheritance that enables them
(write/writer.py::inherit_table_identity): a view's OPTIONS carry only
the path, so appends must adopt keys/type/version from
hoodie.properties — the table is authoritative for its own identity.
The column list is required because the view exposes the _hoodie_*
meta columns (same as Hudi's Spark SQL surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from hudi_rs_spark.sources.pyds import HudiPyDataSource

    spark.dataSource.register(HudiPyDataSource)


def _seed(spark, path, partitioned=False):
    df = spark.createDataFrame(
        [(i, f"n{i}", ["a", "b"][i % 2], 1) for i in range(6)],
        "id int, name string, city string, ts int",
    )
    w = (
        df.write.format("hudi_py").option("path", path)
        .option("recordkey.field", "id")
        .option("precombine.field", "ts")
        .option("table.type", "MERGE_ON_READ")
        .option("table.version", "8")
    )
    if partitioned:
        w = w.option("partitionpath.field", "city")
    w.mode("append").save()


def _ids(spark, view):
    return sorted(r.id for r in spark.sql(f"SELECT id FROM {view}").collect())


class TestSqlInsert:
    def test_insert_into_view(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY VIEW ti USING hudi_py "
            f"OPTIONS (path '{path}')"
        )
        spark.sql("INSERT INTO ti (id, name, city, ts) VALUES (77, 'x', 'a', 2)")
        assert 77 in _ids(spark, "ti")

    def test_insert_select(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY VIEW ts_v USING hudi_py "
            f"OPTIONS (path '{path}')"
        )
        spark.range(100, 103).createOrReplaceTempView("src")
        spark.sql(
            "INSERT INTO ts_v (id, name, city, ts) "
            "SELECT CAST(id AS INT), concat('s', id), 'b', 2 FROM src"
        )
        assert {100, 101, 102} <= set(_ids(spark, "ts_v"))

    def test_insert_partitioned_routes(self, spark, tmp_path):
        import os

        path = str(tmp_path / "t")
        _seed(spark, path, partitioned=True)
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY VIEW tp USING hudi_py "
            f"OPTIONS (path '{path}')"
        )
        spark.sql("INSERT INTO tp (id, name, city, ts) VALUES (88, 'y', 'b', 2)")
        got = spark.sql("SELECT city FROM tp WHERE id = 88").collect()
        assert [r.city for r in got] == ["b"]
        assert os.path.isdir(os.path.join(path, "city=b"))

    def test_minimal_append_inherits_identity(self, spark, tmp_path):
        # a bare df.write with ONLY the path adopts the table's identity
        path = str(tmp_path / "t")
        _seed(spark, path, partitioned=True)
        more = spark.createDataFrame(
            [(99, "z", "a", 2)], "id int, name string, city string, ts int"
        )
        more.write.format("hudi_py").option("path", path).mode("append").save()
        df = spark.read.format("hudi_py").option("path", path).load()
        assert df.filter(F.col("id") == 99).select("city").collect()[0].city == "a"

    def test_explicit_mismatch_still_rejected(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        df = spark.createDataFrame([(5, "q", "a", 2)],
                                   "id int, name string, city string, ts int")
        with pytest.raises(Exception, match="table type mismatch"):
            (
                df.write.format("hudi_py").option("path", path)
                .option("table.type", "COPY_ON_WRITE")
                .mode("append").save()
            )

    def test_insert_overwrite_view(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY VIEW tov USING hudi_py "
            f"OPTIONS (path '{path}')"
        )
        spark.sql(
            "INSERT OVERWRITE tov (id, name, city, ts) VALUES (1, 'only', 'a', 9)"
        )
        assert _ids(spark, "tov") == [1]
