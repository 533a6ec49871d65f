"""CTAS through the SQL router (write/sql.py::_run_create):
``CREATE TABLE t USING hudi_py OPTIONS(...) [PARTITIONED BY ...]
[LOCATION ...] AS SELECT ...`` dispatches to the DataFrame writer —
the reference's DDL-factory semantics
(crates/datafusion/src/lib.rs:936-982 HudiTableFactory)."""

from __future__ import annotations

import pytest

from hudi_rs_spark.write.sql import SqlDmlError, hudi_sql


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from hudi_rs_spark.sources.pyds import HudiPyDataSource

    spark.dataSource.register(HudiPyDataSource)


@pytest.fixture(scope="module", autouse=True)
def _src_view(spark):
    spark.createDataFrame(
        [(i, f"n{i}", 1, "a" if i % 2 else "b") for i in range(20)],
        "id long, name string, ts long, part string",
    ).createOrReplaceTempView("ctas_src")


def _snap(spark, path):
    return {
        r.id: (r.name, r.part)
        for r in spark.read.format("hudi_py").option("path", path).load()
        .select("id", "name", "part").collect()
    }


def _props(path):
    from hudi_rs_spark.config.table_config import HudiTableConfig

    return HudiTableConfig.from_base_path(path).props


class TestCtas:
    def test_basic_ctas_snapshot_equals_select(self, spark, tmp_path):
        t = str(tmp_path / "t")
        hudi_sql(
            spark,
            """
            CREATE TABLE docs USING hudi_py
            OPTIONS (
                recordkey.field 'id',
                precombine.field 'ts',
                table.type 'MERGE_ON_READ',
                table.version '8'
            )
            PARTITIONED BY (part)
            AS SELECT * FROM ctas_src
            """,
            tables={"docs": t},
        )
        assert _snap(spark, t) == {
            i: (f"n{i}", "a" if i % 2 else "b") for i in range(20)
        }
        props = _props(t)
        assert props["hoodie.table.name"] == "docs"
        assert props["hoodie.table.recordkey.fields"] == "id"
        assert "part" in props.get("hoodie.table.partition.fields", "")

    def test_location_and_where(self, spark, tmp_path):
        t = str(tmp_path / "t2")
        hudi_sql(
            spark,
            f"""
            CREATE TABLE t2 USING hudi_py
            OPTIONS (recordkey.field 'id', precombine.field 'ts')
            LOCATION '{t}'
            AS SELECT id, name, ts, part FROM ctas_src WHERE id < 5
            """,
        )
        assert sorted(_snap(spark, t)) == [0, 1, 2, 3, 4]

    def test_existing_table_rejected_unless_if_not_exists(
        self, spark, tmp_path
    ):
        t = str(tmp_path / "t3")
        stmt = (
            "CREATE TABLE t3 USING hudi_py "
            "OPTIONS (recordkey.field 'id', precombine.field 'ts') "
            "AS SELECT * FROM ctas_src"
        )
        hudi_sql(spark, stmt, tables={"t3": t})
        with pytest.raises(SqlDmlError, match="already exists"):
            hudi_sql(spark, stmt, tables={"t3": t})
        # IF NOT EXISTS: silent no-op, snapshot unchanged
        hudi_sql(
            spark,
            stmt.replace("CREATE TABLE", "CREATE TABLE IF NOT EXISTS"),
            tables={"t3": t},
        )
        assert len(_snap(spark, t)) == 20

    def test_ctas_then_dml_composes(self, spark, tmp_path):
        t = str(tmp_path / "t4")
        hudi_sql(
            spark,
            "CREATE TABLE t4 USING hudi_py OPTIONS ("
            "recordkey.field 'id', precombine.field 'ts', "
            "table.type 'MERGE_ON_READ', table.version '8') "
            "PARTITIONED BY (part) AS SELECT * FROM ctas_src",
            tables={"t4": t},
        )
        hudi_sql(
            spark,
            "UPDATE t4 SET name = 'upd' WHERE id = 3",
            tables={"t4": t},
        )
        assert _snap(spark, t)[3] == ("upd", "a")

    def test_requires_using_and_select(self, spark, tmp_path):
        t = str(tmp_path / "t5")
        with pytest.raises(SqlDmlError, match="USING hudi_py"):
            hudi_sql(
                spark,
                "CREATE TABLE t5 AS SELECT * FROM ctas_src",
                tables={"t5": t},
            )
        # (r13) a column list makes this a legal EMPTY-table init —
        # the error is now only for neither-columns-nor-AS
        with pytest.raises(SqlDmlError, match="column list"):
            hudi_sql(
                spark,
                "CREATE TABLE t5 USING hudi_py",
                tables={"t5": t},
            )
        with pytest.raises(SqlDmlError, match="no location"):
            hudi_sql(
                spark,
                "CREATE TABLE nowhere USING hudi_py AS "
                "SELECT * FROM ctas_src",
            )

    def test_tblproperties_spelling(self, spark, tmp_path):
        t = str(tmp_path / "t7")
        hudi_sql(
            spark,
            f"""
            CREATE TABLE t7 USING hudi_py
            TBLPROPERTIES (
                recordkey.field = 'id',
                precombine.field = 'ts'
            )
            LOCATION '{t}'
            AS SELECT id, name, ts, part FROM ctas_src WHERE id >= 15
            """,
        )
        assert sorted(_snap(spark, t)) == [15, 16, 17, 18, 19]
        assert _props(t)["hoodie.table.recordkey.fields"] == "id"

    def test_sql_script_runner(self, spark, tmp_path):
        from hudi_rs_spark.write.sql import hudi_sql_script

        t = str(tmp_path / "t8")
        results = hudi_sql_script(
            spark,
            f"""
            -- create, then mutate; the ';' inside the string literal
            -- below must NOT split the statement
            CREATE TABLE t8 USING hudi_py
            OPTIONS (recordkey.field 'id', precombine.field 'ts',
                     table.type 'MERGE_ON_READ', table.version '8')
            LOCATION '{t}'
            AS SELECT id, name, ts, part FROM ctas_src WHERE id < 6;

            UPDATE t8 SET name = 'a;b' WHERE id = 2;
            DELETE FROM t8 WHERE id = 5;
            """,
            tables={"t8": t},
        )
        assert len(results) == 3
        snap = _snap(spark, t)
        assert sorted(snap) == [0, 1, 2, 3, 4]
        assert snap[2][0] == "a;b"

    def test_script_fail_fast(self, spark, tmp_path):
        from hudi_rs_spark.write.sql import hudi_sql_script

        t = str(tmp_path / "t9")
        with pytest.raises(SqlDmlError):
            hudi_sql_script(
                spark,
                f"""
                CREATE TABLE t9 USING hudi_py
                OPTIONS (recordkey.field 'id', precombine.field 'ts')
                LOCATION '{t}'
                AS SELECT id, name, ts, part FROM ctas_src;
                VACUUM t9;
                DELETE FROM t9 WHERE id = 0;
                """,
                tables={"t9": t},
            )
        # statement 1 committed before the failure; statement 3 never ran
        assert len(_snap(spark, t)) == 20

    def test_options_path_and_quoted_values(self, spark, tmp_path):
        t = str(tmp_path / "t6")
        hudi_sql(
            spark,
            f"""
            CREATE TABLE t6 USING hudi_py
            OPTIONS (
                path = '{t}',
                recordkey.field = 'id',
                precombine.field = 'ts',
                hoodie.table.name = 'renamed'
            )
            AS SELECT id, name, ts, part FROM ctas_src WHERE part = 'b'
            """,
        )
        assert all(p == "b" for _, p in _snap(spark, t).values())
        assert _props(t)["hoodie.table.name"] == "renamed"


class TestCreateEmptyTable:
    """Schema-only CREATE TABLE (r13): hoodie.properties + one
    metadata-only schema commit — reads return 0 rows with the declared
    columns, and INSERT INTO / upsert land with the identity pinned."""

    def test_create_read_insert_roundtrip(self, spark, tmp_path):
        from hudi_rs_spark.write.sql import hudi_sql

        t = str(tmp_path / "t")
        hudi_sql(
            spark,
            "CREATE TABLE t (id BIGINT, name STRING, part STRING, ts BIGINT) "
            "USING hudi_py OPTIONS(recordkey.field 'id', "
            "precombine.field 'ts', partitionpath.field 'part', "
            "'table.type' 'MERGE_ON_READ', 'table.version' '8') "
            f"LOCATION '{t}'",
        )
        df = spark.read.format("hudi_py").option("path", t).load()
        assert df.count() == 0
        assert {"id", "name", "part", "ts"} <= set(df.columns)
        hudi_sql(
            spark,
            "INSERT INTO t VALUES (1, 'a', 'x', 1), (2, 'b', 'y', 1)",
            tables={"t": t},
        )
        got = {
            r.id: r.name
            for r in spark.read.format("hudi_py").option("path", t)
            .load().collect()
        }
        assert got == {1: "a", 2: "b"}
        # identity persisted: upsert with no options works
        from hudi_rs_spark.write.upsert import upsert

        upsert(
            spark.createDataFrame(
                [(1, "upd", "x", 2)],
                "id long, name string, part string, ts long",
            ),
            t,
        )
        got = {
            r.id: r.name
            for r in spark.read.format("hudi_py").option("path", t)
            .load().collect()
        }
        assert got == {1: "upd", 2: "b"}

    def test_guards(self, spark, tmp_path):
        from hudi_rs_spark.write.sql import SqlDmlError, hudi_sql

        t = str(tmp_path / "t")
        with pytest.raises(SqlDmlError, match="column list"):
            hudi_sql(spark, f"CREATE TABLE t USING hudi_py LOCATION '{t}'")
        with pytest.raises(SqlDmlError, match="not in the declared"):
            hudi_sql(
                spark,
                "CREATE TABLE t (name STRING) USING hudi_py "
                f"OPTIONS(recordkey.field 'id') LOCATION '{t}'",
            )
        hudi_sql(
            spark,
            "CREATE TABLE t (id BIGINT, ts BIGINT) USING hudi_py "
            "OPTIONS(recordkey.field 'id', precombine.field 'ts') "
            f"LOCATION '{t}'",
        )
        with pytest.raises(SqlDmlError, match="already exists"):
            hudi_sql(
                spark,
                "CREATE TABLE t (id BIGINT, ts BIGINT) USING hudi_py "
                f"LOCATION '{t}'",
            )
        # IF NOT EXISTS: silent no-op
        hudi_sql(
            spark,
            "CREATE TABLE IF NOT EXISTS t (id BIGINT, ts BIGINT) "
            f"USING hudi_py LOCATION '{t}'",
        )
