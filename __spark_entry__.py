"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query (TPC-H-style q5 6-way join) at sf0.001.
queries()    — every implemented operator from SURVEY.md §2 that runs on
               the driver's plain-parquet tables, via the workload
               registry (hudi_rs_spark/workloads/*).
oracle_sql() — matching DuckDB SQL for each query (None entries omitted ->
               rows-only check).

The Hudi-format reader itself (timeline/MOR merge/time travel on real
Hudi tables) is exercised by pytest against the reference's golden
fixtures — see tests/test_hudi_read.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registry():
    from hudi_rs_spark.workloads import load_all

    return load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from hudi_rs_spark.session import configure_session

    configure_session(spark)
    specs = _registry()
    return specs["q1_pricing_summary"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from hudi_rs_spark.session import configure_session

    specs = _registry()

    def make(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_session(spark)
            return spec.build(spark, sf_dir)

        return run

    return {name: make(spec) for name, spec in specs.items()}


def oracle_sql() -> dict[str, str]:
    specs = _registry()
    return {name: spec.oracle for name, spec in specs.items() if spec.oracle}
