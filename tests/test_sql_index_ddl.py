"""CREATE INDEX / DROP INDEX SQL grammar (write/sql.py::_run_create_index
/ _run_drop_index) — Hudi 1.0's index DDL, dispatching to the SAME
services as CALL run_index / drop_index, so both spellings build
identical MDT partitions."""

from __future__ import annotations

import pytest

from hudi_rs_spark.write.sql import SqlDmlError, hudi_sql


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from hudi_rs_spark.sources.pyds import HudiPyDataSource

    spark.dataSource.register(HudiPyDataSource)


def _seed(spark, path):
    df = spark.createDataFrame(
        [(i, f"n{i}", ["x", "y"][i % 2], 1) for i in range(40)],
        "id long, name string, city string, ts long",
    )
    (
        df.repartition(2).write.format("hudi_py").option("path", path)
        .option("recordkey.field", "id")
        .option("precombine.field", "ts")
        .option("table.type", "MERGE_ON_READ")
        .option("table.version", "8")
        .option("metadata.enable", "true")
        .mode("append").save()
    )


def _index_names(spark, tables):
    return {
        r.index_name
        for r in hudi_sql(
            spark, "CALL show_indexes(table => 't')", tables=tables
        ).collect()
    }


class TestCreateIndex:
    def test_record_and_bloom(self, spark, tmp_path):
        t = str(tmp_path / "t")
        tables = {"t": t}
        _seed(spark, t)
        assert hudi_sql(
            spark,
            "CREATE INDEX record_index ON t (id) OPTIONS(shards 4)",
            tables=tables,
        ) > 0
        assert hudi_sql(
            spark, "CREATE INDEX bloom_filters ON t USING bloom_filters(id)",
            tables=tables,
        ) > 0
        assert {"record_index", "bloom_filters"} <= _index_names(spark, tables)

    def test_expression_matches_call_procedure(self, spark, tmp_path):
        """The DDL and the CALL build the same MDT partition content."""
        from hudi_rs_spark.metadata.column_stats import read_column_stats

        ddl, call = str(tmp_path / "a"), str(tmp_path / "b")
        _seed(spark, ddl)
        _seed(spark, call)
        n1 = hudi_sql(
            spark,
            "CREATE INDEX idx_mod ON t USING expression(id % 7)",
            tables={"t": ddl},
        )
        n2 = hudi_sql(
            spark,
            "CALL run_index(table => 't', index_type => 'expression', "
            "name => 'idx_mod', expr => 'id % 7')",
            tables={"t": call},
        )
        assert n1 == n2 > 0
        def bounds(path):
            stats = read_column_stats(path, partition="expr_index_idx_mod")
            return sorted(
                mm for cols in stats.values() for mm in cols.values()
            )

        s1, s2 = bounds(ddl), bounds(call)
        assert s1 and s1 == s2

    def test_column_stats_is_identity_expression(self, spark, tmp_path):
        t = str(tmp_path / "t")
        tables = {"t": t}
        _seed(spark, t)
        assert hudi_sql(
            spark, "CREATE INDEX idx_city ON t USING column_stats(city)",
            tables=tables,
        ) > 0
        from hudi_rs_spark.config.table_config import HudiTableConfig

        props = HudiTableConfig.from_base_path(t).props
        assert props["hoodie.table.expr.index.idx_city"] == "city"

    def test_functional_form_with_expr_option(self, spark, tmp_path):
        """Hudi's spelling: column_stats(col) OPTIONS(expr 'fn')."""
        t = str(tmp_path / "t")
        tables = {"t": t}
        _seed(spark, t)
        assert hudi_sql(
            spark,
            "CREATE INDEX idx_up ON t USING column_stats(name) "
            "OPTIONS(expr 'upper')",
            tables=tables,
        ) > 0
        from hudi_rs_spark.config.table_config import HudiTableConfig

        props = HudiTableConfig.from_base_path(t).props
        assert props["hoodie.table.expr.index.idx_up"] == "upper(name)"

    def test_if_not_exists_and_unknown_type(self, spark, tmp_path):
        t = str(tmp_path / "t")
        tables = {"t": t}
        _seed(spark, t)
        hudi_sql(
            spark, "CREATE INDEX x2 ON t USING expression(id * 2)",
            tables=tables,
        )
        # second CREATE without IF NOT EXISTS raises (service refuses)
        with pytest.raises(Exception):
            hudi_sql(
                spark, "CREATE INDEX x2 ON t USING expression(id * 2)",
                tables=tables,
            )
        assert hudi_sql(
            spark,
            "CREATE INDEX IF NOT EXISTS x2 ON t USING expression(id * 2)",
            tables=tables,
        ) == 0
        with pytest.raises(SqlDmlError, match="index type"):
            hudi_sql(
                spark, "CREATE INDEX b ON t USING btree(id)", tables=tables
            )


class TestDropIndex:
    def test_drop_and_if_exists(self, spark, tmp_path):
        t = str(tmp_path / "t")
        tables = {"t": t}
        _seed(spark, t)
        hudi_sql(
            spark, "CREATE INDEX idx ON t USING expression(id % 3)",
            tables=tables,
        )
        assert any("idx" in x for x in _index_names(spark, tables))
        assert hudi_sql(spark, "DROP INDEX idx ON t", tables=tables)
        assert not any("idx" in x for x in _index_names(spark, tables))
        with pytest.raises(SqlDmlError, match="does not exist"):
            hudi_sql(spark, "DROP INDEX idx ON t", tables=tables)
        assert not hudi_sql(
            spark, "DROP INDEX IF EXISTS idx ON t", tables=tables
        )
