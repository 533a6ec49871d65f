"""INSERT INTO / INSERT OVERWRITE through the hudi_sql router
(write/sql.py::_run_insert): the source SELECT runs through the same
plain-SELECT machinery (named hudi tables become snapshot views,
TIMESTAMP AS OF rewrites apply), VALUES lists are rewritten to an
inline table, and the frame lands through the DataFrame writer with
table-identity inheritance — so a bare ``INSERT INTO t SELECT …`` works
with nothing but the path."""

from __future__ import annotations

import pytest

from hudi_rs_spark.write.sql import SqlDmlError, hudi_sql


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from hudi_rs_spark.sources.pyds import HudiPyDataSource

    spark.dataSource.register(HudiPyDataSource)


def _seed(spark, path, n=6):
    df = spark.createDataFrame(
        [(i, f"n{i}", ["a", "b"][i % 2], 1) for i in range(n)],
        "id long, name string, part string, ts long",
    )
    (
        df.write.format("hudi_py").option("path", path)
        .option("recordkey.field", "id")
        .option("precombine.field", "ts")
        .option("partitionpath.field", "part")
        .option("table.type", "MERGE_ON_READ")
        .option("table.version", "8")
        .mode("append").save()
    )


def _snap(spark, path):
    return {
        r.id: (r.name, r.part)
        for r in spark.read.format("hudi_py").option("path", path)
        .load().select("id", "name", "part").collect()
    }


class TestInsertInto:
    def test_insert_select_appends(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _seed(spark, t)
        spark.createDataFrame(
            [(10, "x10", "a", 2), (11, "x11", "b", 2)],
            "id long, name string, part string, ts long",
        ).createOrReplaceTempView("src")
        hudi_sql(
            spark, "INSERT INTO t SELECT id, name, part, ts FROM src",
            tables={"t": t},
        )
        snap = _snap(spark, t)
        assert len(snap) == 8
        assert snap[10] == ("x10", "a") and snap[0] == ("n0", "a")

    def test_insert_values(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _seed(spark, t)
        hudi_sql(
            spark,
            "INSERT INTO t VALUES (20, 'v20', 'a', 2), (21, 'v21', 'b', 2)",
            tables={"t": t},
        )
        snap = _snap(spark, t)
        assert snap[20] == ("v20", "a") and snap[21] == ("v21", "b")
        assert len(snap) == 8

    def test_insert_column_list_fills_missing_with_null(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _seed(spark, t)
        hudi_sql(
            spark,
            "INSERT INTO t (id, part, ts) VALUES (30, 'a', 2)",
            tables={"t": t},
        )
        snap = _snap(spark, t)
        assert snap[30] == (None, "a")

    def test_insert_from_hudi_table_with_time_travel(self, spark, tmp_path):
        """Source SELECT may read another hudi table, including AS OF."""
        from hudi_rs_spark.sources.hudi import HudiTable
        from hudi_rs_spark.write.upsert import upsert

        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        _seed(spark, src)
        pre = HudiTable(src, spark).timeline.instants[-1].timestamp
        upsert(
            spark.createDataFrame(
                [(0, "changed", "a", 2)],
                "id long, name string, part string, ts long",
            ),
            src,
        )
        _seed(spark, dst, n=1)
        hudi_sql(
            spark,
            "INSERT INTO dst SELECT id, name, part, ts FROM src "
            f"TIMESTAMP AS OF '{pre}' WHERE id >= 3",
            tables={"src": src, "dst": dst},
        )
        snap = _snap(spark, dst)
        # pre-upsert names came through; dst seed row intact
        assert snap[3] == ("n3", "b") and snap[5] == ("n5", "b")
        assert snap[0] == ("n0", "a")
        assert len(snap) == 4

    def test_insert_overwrite_replaces(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _seed(spark, t)
        hudi_sql(
            spark,
            "INSERT OVERWRITE t VALUES (100, 'o', 'a', 9)",
            tables={"t": t},
        )
        snap = _snap(spark, t)
        assert snap == {100: ("o", "a")}
        # time travel still sees the pre-overwrite rows
        from hudi_rs_spark.sources.hudi import HudiTable

        tl = HudiTable(t, spark).timeline.instants
        assert len(tl) == 2

    def test_unknown_table_and_bad_source(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _seed(spark, t)
        with pytest.raises(SqlDmlError, match="unknown table"):
            hudi_sql(spark, "INSERT INTO nope VALUES (1, 'a', 'a', 1)")
        with pytest.raises(SqlDmlError, match="INSERT"):
            hudi_sql(spark, "INSERT INTO t", tables={"t": t})


class TestShowStatements:
    def test_show_sugar_over_call_procedures(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _seed(spark, t)
        tables = {"t": t}
        parts = {
            r.partition
            for r in hudi_sql(
                spark, "SHOW PARTITIONS t", tables=tables
            ).collect()
        }
        assert parts == {"part=a", "part=b"}
        commits = hudi_sql(
            spark, "SHOW COMMITS FROM t", tables=tables
        ).collect()
        assert len(commits) == 1
        props = {
            r.key
            for r in hudi_sql(
                spark, "SHOW TBLPROPERTIES t", tables=tables
            ).collect()
        }
        assert "hoodie.table.name" in props
        # no MDT on this table: SHOW INDEXES answers (empty), not errors
        assert hudi_sql(
            spark, "SHOW INDEXES FROM t", tables=tables
        ).collect() == []
        with pytest.raises(SqlDmlError, match="SHOW"):
            hudi_sql(spark, "SHOW WIDGETS FROM t", tables=tables)


class TestInsertPartitionClause:
    def test_insert_into_partition_statics(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _seed(spark, t)
        hudi_sql(
            spark,
            "INSERT INTO t PARTITION (part = 'a') VALUES (40, 'p40', 2)",
            tables={"t": t},
        )
        snap = _snap(spark, t)
        assert snap[40] == ("p40", "a") and len(snap) == 7

    def test_insert_overwrite_partition_is_dynamic(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _seed(spark, t)  # part=a holds ids 0,2,4; part=b holds 1,3,5
        hudi_sql(
            spark,
            "INSERT OVERWRITE t PARTITION (part = 'a') "
            "VALUES (50, 'only_a', 9)",
            tables={"t": t},
        )
        snap = _snap(spark, t)
        # partition a fully replaced, partition b untouched
        assert {i for i, (_, p) in snap.items() if p == "a"} == {50}
        assert {i for i, (_, p) in snap.items() if p == "b"} == {1, 3, 5}

    def test_partition_column_validated(self, spark, tmp_path):
        t = str(tmp_path / "t")
        _seed(spark, t)
        with pytest.raises(SqlDmlError, match="PARTITION column"):
            hudi_sql(
                spark,
                "INSERT INTO t PARTITION (ghost = 'x') VALUES (1, 'a', 1)",
                tables={"t": t},
            )


class TestFullSqlScript:
    def test_ddl_dml_query_script_end_to_end(self, spark, tmp_path):
        """One script exercising the whole r13 SQL statement surface:
        empty CREATE TABLE -> INSERT VALUES -> INSERT INTO SELECT with
        time travel -> UPDATE -> CREATE INDEX-free SHOW -> final query.
        Statement-by-statement autocommit through hudi_sql_script."""
        from hudi_rs_spark.write.sql import hudi_sql_script

        t = str(tmp_path / "t")
        script = f"""
        -- init an empty MOR table
        CREATE TABLE t (id BIGINT, name STRING, part STRING, ts BIGINT)
        USING hudi_py OPTIONS(recordkey.field 'id',
            precombine.field 'ts', partitionpath.field 'part',
            'table.type' 'MERGE_ON_READ', 'table.version' '8')
        LOCATION '{t}';

        INSERT INTO t VALUES (1, 'a;b', 'x', 1), (2, 'b', 'y', 1);
        INSERT INTO t PARTITION (part = 'x') VALUES (3, 'c', 1);
        UPDATE t SET name = 'B' WHERE id = 2;
        SHOW PARTITIONS t;
        SELECT id, name, part FROM t ORDER BY id
        """
        results = hudi_sql_script(spark, script, tables={"t": t})
        assert len(results) == 6
        parts = {r.partition for r in results[4].collect()}
        assert parts == {"part=x", "part=y"}
        rows = [(r.id, r.name, r.part) for r in results[5].collect()]
        assert rows == [(1, "a;b", "x"), (2, "B", "y"), (3, "c", "x")]


class TestInsertFromTvf:
    def test_insert_select_from_hudi_query_tvf(self, spark, tmp_path):
        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        _seed(spark, src)
        # empty twin via LIKE, then fill it from the TVF (unquoted AND
        # quoted table tokens both resolve through the tables map)
        hudi_sql(
            spark, f"CREATE TABLE d LIKE s LOCATION '{dst}'",
            tables={"s": src},
        )
        hudi_sql(
            spark,
            "INSERT INTO d SELECT id, name, part, ts "
            "FROM hudi_query(s, 'snapshot')",
            tables={"s": src, "d": dst},
        )
        assert _snap(spark, dst) == _snap(spark, src)

    def test_insert_select_from_table_changes_tvf(self, spark, tmp_path):
        from hudi_rs_spark.write.upsert import upsert

        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        _seed(spark, src)
        from hudi_rs_spark.sources.hudi import HudiTable

        first = HudiTable(src, spark).timeline.latest_commit_timestamp()
        upsert(
            spark.createDataFrame(
                [(1, "u1", "b", 2)],
                "id long, name string, part string, ts long",
            ),
            src,
        )
        hudi_sql(
            spark, f"CREATE TABLE d LIKE s LOCATION '{dst}'",
            tables={"s": src},
        )
        hudi_sql(
            spark,
            "INSERT INTO d SELECT id, name, part, ts FROM "
            f"hudi_table_changes('s', 'latest_state', '{first}')",
            tables={"s": src, "d": dst},
        )
        assert _snap(spark, dst) == {1: ("u1", "b")}
