"""hoodie.datasource.write.drop.partition.columns=true: partition
columns live only in the partition PATHS, not the data files. Reads
must (1) not evaluate partition filters against the null scan columns
(reference strips them per-slice: table/mod.rs:725-753
options_for_file_group), and (2) restore the values from the paths so
the output matches a table written without the flag."""

from __future__ import annotations

import pytest

from tests.synth import SynthTable, avro_schema

C1 = "20240101000000000"

PROPS = {
    "hoodie.table.partition.fields": "region",
    "hoodie.datasource.write.drop.partition.columns": "true",
    "hoodie.datasource.write.hive_style_partitioning": "true",
}

SCHEMA = avro_schema(
    [("id", "string"), ("ts", "long"), ("val", "string"), ("region", "string")]
)


def _table(tmp_path) -> SynthTable:
    import os

    t = SynthTable(os.path.join(str(tmp_path), "tbl"), extra_props=PROPS)
    # data dicts deliberately OMIT the 'region' column (dropped)
    t.write_base(
        "g1-0", C1, {"id": ["a"], "ts": [1], "val": ["v1"]}, ["a"],
        partition="region=emea",
    )
    t.write_base(
        "g2-0", C1, {"id": ["b"], "ts": [1], "val": ["v2"]}, ["b"],
        partition="region=apac",
    )
    t.commit(C1, schema=SCHEMA)
    return t


class TestEagerRead:
    def test_values_restored_from_paths(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable

        t = _table(tmp_path)
        rows = {r["id"]: r["region"] for r in HudiTable(t.base_path, spark).read().collect()}
        assert rows == {"a": "emea", "b": "apac"}

    def test_partition_filter_prunes_not_nulls_out(self, spark, tmp_path):
        """Pre-fix behavior: the residual filter hit the all-null scan
        column and returned ZERO rows. Now the pruner does the filtering
        and the residual is stripped."""
        from hudi_rs_spark.config.read_config import HudiReadOptions
        from hudi_rs_spark.sources.hudi import HudiTable

        t = _table(tmp_path)
        df = HudiTable(t.base_path, spark).read(
            HudiReadOptions(filters=[("region", "=", "emea")])
        )
        rows = [(r["id"], r["region"]) for r in df.collect()]
        assert rows == [("a", "emea")]
        # and the pruning really happened at plan level: one base file
        from hudi_rs_spark.plans.partition_pruner import Filter

        slices = HudiTable(t.base_path, spark).get_file_slices(
            None, [Filter("region", "=", "emea")]
        )
        assert len(slices) == 1

    def test_non_partition_filters_still_apply(self, spark, tmp_path):
        from hudi_rs_spark.config.read_config import HudiReadOptions
        from hudi_rs_spark.sources.hudi import HudiTable

        t = _table(tmp_path)
        df = HudiTable(t.base_path, spark).read(
            HudiReadOptions(filters=[("val", "=", "v2")])
        )
        assert [(r["id"], r["region"]) for r in df.collect()] == [("b", "apac")]


class TestConnector:
    @pytest.fixture(autouse=True)
    def _register(self, spark):
        from hudi_rs_spark.sources.pyds import HudiPyDataSource

        spark.dataSource.register(HudiPyDataSource)

    def test_connector_restores_and_filters(self, spark, tmp_path):
        t = _table(tmp_path)
        conn = spark.read.format("hudi_py").option("path", t.base_path).load()
        rows = {r["id"]: r["region"] for r in conn.collect()}
        assert rows == {"a": "emea", "b": "apac"}
        # SQL WHERE on the restored column: Spark re-applies the filter
        # against the per-slice literals -> correct rows
        got = conn.filter("region = 'apac'").collect()
        assert [(r["id"], r["region"]) for r in got] == [("b", "apac")]
