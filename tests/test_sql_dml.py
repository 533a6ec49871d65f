"""SQL-statement DML router (write/sql.py::hudi_sql): the exact
statements the Spark SQL docs show for Hudi, dispatched to the existing
merge_into / update_where / delete_where / delete_partitions APIs, with
oracle parity against the API twins.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from hudi_rs_spark.sources.pyds import HudiPyDataSource

    spark.dataSource.register(HudiPyDataSource)


OPTS = {
    "recordkey.field": "id", "precombine.field": "ts",
    "partitionpath.field": "part", "table.type": "MERGE_ON_READ",
    "table.version": "8",
}


def _rows(spark, n=20, start=0, ts=1, name="n"):
    return spark.createDataFrame(
        [
            (start + i, f"{name}{start + i}", ts,
             "a" if (start + i) % 2 else "b")
            for i in range(n)
        ],
        "id long, name string, ts long, part string",
    )


def _seed(spark, tmp_path, name="t"):
    t = str(tmp_path / name)
    w = _rows(spark).write.format("hudi_py").option("path", t)
    for k, v in OPTS.items():
        w = w.option(k, v)
    w.mode("append").save()
    return t


def _snap(spark, t):
    from hudi_rs_spark.sources.hudi import HudiTable

    return {
        r.id: (r.name, r.ts, r.part)
        for r in HudiTable(t, spark).read().collect()
    }


class TestUpdateDelete:
    def test_update_where(self, spark, tmp_path):
        from hudi_rs_spark.write.sql import hudi_sql

        t = _seed(spark, tmp_path)
        n = hudi_sql(
            spark,
            "UPDATE t SET name = concat(name, '#w'), ts = 5 "
            "WHERE id % 4 = 0;",
            tables={"t": t},
        )
        assert n == 5
        snap = _snap(spark, t)
        assert snap[4] == ("n4#w", 5, "b") and snap[3] == ("n3", 1, "a")

    def test_delete_from(self, spark, tmp_path):
        from hudi_rs_spark.write.sql import hudi_sql

        t = _seed(spark, tmp_path)
        n = hudi_sql(spark, "DELETE FROM t WHERE id >= 15", tables={"t": t})
        assert n == 5
        snap = _snap(spark, t)
        assert len(snap) == 15 and 15 not in snap

    def test_path_literal_and_unknown_table(self, spark, tmp_path):
        from hudi_rs_spark.write.sql import SqlDmlError, hudi_sql

        t = _seed(spark, tmp_path)
        n = hudi_sql(spark, f"DELETE FROM '{t}' WHERE id = 0")
        assert n == 1
        with pytest.raises(SqlDmlError, match="unknown table"):
            hudi_sql(spark, "DELETE FROM nope WHERE id = 0")

    def test_where_keywords_inside_strings_do_not_split(
        self, spark, tmp_path
    ):
        from hudi_rs_spark.write.sql import hudi_sql

        t = _seed(spark, tmp_path)
        n = hudi_sql(
            spark,
            "UPDATE t SET name = 'where, and then' WHERE id = 1",
            tables={"t": t},
        )
        assert n == 1
        assert _snap(spark, t)[1][0] == "where, and then"


class TestDropPartition:
    def test_drop_partition(self, spark, tmp_path):
        from hudi_rs_spark.write.sql import hudi_sql

        t = _seed(spark, tmp_path)
        n = hudi_sql(
            spark,
            "ALTER TABLE t DROP PARTITION (part='b')",
            tables={"t": t},
        )
        assert n >= 1
        snap = _snap(spark, t)
        assert all(v[2] == "a" for v in snap.values()) and len(snap) == 10

    def test_drop_multiple_partitions_if_exists(self, spark, tmp_path):
        from hudi_rs_spark.write.sql import hudi_sql

        t = _seed(spark, tmp_path)
        n = hudi_sql(
            spark,
            "ALTER TABLE t DROP IF EXISTS "
            "PARTITION (part='a'), PARTITION (part='b')",
            tables={"t": t},
        )
        assert n >= 2
        assert _snap(spark, t) == {}


class TestMergeInto:
    def _source(self, spark):
        # op: u = update, d = delete, i = insert
        return spark.createDataFrame(
            [
                (1, "u1", 9, "a", "u"),
                (2, "d2", 9, "b", "d"),
                (100, "i100", 9, "b", "i"),
            ],
            "id long, name string, ts long, part string, op string",
        )

    def test_merge_doc_statement_parity_with_api(self, spark, tmp_path):
        from hudi_rs_spark.write.merge_into import merge_into
        from hudi_rs_spark.write.sql import hudi_sql

        t_sql = _seed(spark, tmp_path, "t_sql")
        t_api = _seed(spark, tmp_path, "t_api")
        self._source(spark).createOrReplaceTempView("src_changes")

        hudi_sql(
            spark,
            """
            MERGE INTO target AS tgt
            USING src_changes AS src
            ON tgt.id = src.id
            WHEN MATCHED AND src.op = 'd' THEN DELETE
            WHEN MATCHED THEN UPDATE SET name = src.name, ts = src.ts
            WHEN NOT MATCHED THEN INSERT *
            """,
            tables={"target": t_sql},
        )
        merge_into(
            self._source(spark),
            t_api,
            when_matched_delete="s.op = 'd'",
            when_matched_update={"name": "s.name", "ts": "s.ts"},
            when_not_matched_insert="all",
        )
        assert _snap(spark, t_sql) == _snap(spark, t_api)
        snap = _snap(spark, t_sql)
        assert snap[1] == ("u1", 9, "a") and 2 not in snap
        assert snap[100][0] == "i100"

    def test_merge_update_star_and_insert_columns(self, spark, tmp_path):
        from hudi_rs_spark.write.sql import hudi_sql

        t = _seed(spark, tmp_path)
        self._source(spark).createOrReplaceTempView("src2")
        hudi_sql(
            spark,
            "MERGE INTO t USING src2 AS s ON t.id = s.id "
            "WHEN MATCHED AND s.op = 'u' THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT (id, name, ts, part) "
            "VALUES (s.id, upper(s.name), s.ts, s.part)",
            tables={"t": t},
        )
        snap = _snap(spark, t)
        assert snap[1] == ("u1", 9, "a")  # update-all took source values
        assert snap[2] == ("n2", 1, "b")  # op='d' row gated out of update
        assert snap[100] == ("I100", 9, "b")  # insert expressions applied

    def test_merge_with_subquery_source(self, spark, tmp_path):
        from hudi_rs_spark.write.sql import hudi_sql

        t = _seed(spark, tmp_path)
        self._source(spark).createOrReplaceTempView("src3")
        hudi_sql(
            spark,
            "MERGE INTO t USING "
            "(SELECT id, name, ts, part FROM src3 WHERE op = 'u') u "
            "ON t.id = u.id "
            "WHEN MATCHED THEN UPDATE SET name = u.name "
            "WHEN NOT MATCHED THEN INSERT *",
            tables={"t": t},
        )
        snap = _snap(spark, t)
        assert snap[1][0] == "u1" and 100 not in snap

    def test_merge_hudi_table_as_source(self, spark, tmp_path):
        from hudi_rs_spark.write.sql import hudi_sql

        t = _seed(spark, tmp_path, "tgt")
        src = str(tmp_path / "srct")
        w = (
            self._source(spark).drop("op")
            .write.format("hudi_py").option("path", src)
        )
        for k, v in OPTS.items():
            w = w.option(k, v)
        w.mode("append").save()
        hudi_sql(
            spark,
            "MERGE INTO t USING s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET * ",
            tables={"t": t, "s": src},
        )
        snap = _snap(spark, t)
        assert snap[1] == ("u1", 9, "a") and 100 not in snap

    def test_unsupported_shapes_rejected(self, spark, tmp_path):
        from hudi_rs_spark.write.sql import SqlDmlError, hudi_sql

        t = _seed(spark, tmp_path)
        self._source(spark).createOrReplaceTempView("src4")
        with pytest.raises(SqlDmlError, match="equi-join"):
            hudi_sql(
                spark,
                "MERGE INTO t USING src4 s ON t.id > s.id "
                "WHEN MATCHED THEN DELETE",
                tables={"t": t},
            )
        with pytest.raises(SqlDmlError, match="supported statements"):
            hudi_sql(spark, "VACUUM t", tables={"t": t})
        with pytest.raises(SqlDmlError, match="at most one"):
            hudi_sql(
                spark,
                "MERGE INTO t USING src4 s ON t.id = s.id "
                "WHEN MATCHED THEN DELETE WHEN MATCHED THEN DELETE",
                tables={"t": t},
            )


class TestMergeTvfSource:
    def test_merge_using_bare_tvf(self, spark, tmp_path):
        from hudi_rs_spark.write.sql import hudi_sql

        t = _seed(spark, tmp_path, "t")
        s = _seed(spark, tmp_path, "s")
        # mutate the source so the merge has updates to carry
        hudi_sql(
            spark, "UPDATE s SET name = 'x5' WHERE id = 5",
            tables={"s": s},
        )
        hudi_sql(
            spark,
            "MERGE INTO t USING hudi_query(s, 'snapshot') src "
            "ON t.id = src.id "
            "WHEN MATCHED AND src.name = 'x5' THEN UPDATE SET "
            "name = src.name",
            tables={"t": t, "s": s},
        )
        got = _snap(spark, t)
        assert got[5][0] == "x5"
        assert got[4][0] == "n4"  # untouched

    def test_merge_using_subquery_with_tvf(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable
        from hudi_rs_spark.write.sql import hudi_sql
        from hudi_rs_spark.write.upsert import upsert

        t = _seed(spark, tmp_path, "t")
        s = _seed(spark, tmp_path, "s")
        first = HudiTable(s, spark).timeline.latest_commit_timestamp()
        upsert(_rows(spark, n=2, start=3, ts=2, name="w"), s)
        # only the change window (first, latest] feeds the merge
        hudi_sql(
            spark,
            "MERGE INTO t USING (SELECT id, name FROM "
            f"hudi_table_changes('s', 'latest_state', '{first}')) src "
            "ON t.id = src.id "
            "WHEN MATCHED THEN UPDATE SET name = src.name",
            tables={"t": t, "s": s},
        )
        got = _snap(spark, t)
        assert got[3][0] == "w3" and got[4][0] == "w4"
        assert got[5][0] == "n5"  # outside the window: untouched
