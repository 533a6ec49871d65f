"""Final aggregation batch: cube / grouping sets, approximate distinct,
INTERSECT, and a salt-proofed aggregation (identical results to plain
groupBy — the salting only changes shuffle distribution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hudi_rs_spark.operators.skew import salted_aggregate
from hudi_rs_spark.workloads import QuerySpec, register
from hudi_rs_spark.workloads.sqlutil import dec, round2
from hudi_rs_spark.workloads.tables import load


def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            round2(F.sum(dec("o_totalprice"))).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2)::DOUBLE AS total,
       CAST(count(*) AS BIGINT) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts (the oracle-checkable face of cardinality
    estimation; approx_count_distinct is exercised in pytest where a
    tolerance check fits better than a hash match)."""
    l = load(spark, sf_dir, "lineitem")
    return l.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


DISTINCT_SQL = """
SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
FROM lineitem
"""


def intersect_loyal_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers ordering in both years (INTERSECT set op)."""
    o = load(spark, sf_dir, "orders")
    y96 = o.filter(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("custkey")
    )
    y97 = o.filter(F.year("o_orderdate") == 1997).select(
        F.col("o_custkey").alias("custkey")
    )
    return y96.intersect(y97).orderBy("custkey")


INTERSECT_SQL = """
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
INTERSECT
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
ORDER BY custkey
"""


def salted_revenue_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof aggregation: identical output to a plain groupBy, but
    the first shuffle fans every (potentially hot) key over 16 salt
    buckets (operators/skew.py)."""
    o = load(spark, sf_dir, "orders").withColumn(
        "__price_dec", dec("o_totalprice")
    )
    out = salted_aggregate(
        o,
        ["o_orderstatus"],
        {
            "total_dec": ("sum", "__price_dec"),
            "n": ("count", "__price_dec"),
            "max_price": ("max", "o_totalprice"),
        },
        salt_buckets=16,
    )
    return out.select(
        "o_orderstatus",
        round2(F.col("total_dec")).alias("total"),
        F.col("n").cast("bigint").alias("n"),
        F.col("max_price"),
    ).orderBy("o_orderstatus")


SALTED_SQL = """
SELECT o_orderstatus,
       ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2)::DOUBLE AS total,
       CAST(count(*) AS BIGINT) AS n,
       MAX(o_totalprice) AS max_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


for _n, _f, _s, _d in [
    ("cube_revenue", cube_revenue, CUBE_SQL, "CUBE grouping sets"),
    ("distinct_counts", distinct_counts, DISTINCT_SQL, "multi count-distinct"),
    ("intersect_loyal_customers", intersect_loyal_customers, INTERSECT_SQL, "INTERSECT set op"),
    ("salted_revenue_by_status", salted_revenue_by_status, SALTED_SQL, "skew-proof salted agg"),
]:
    register(QuerySpec(name=_n, build=_f, oracle=_s, tags=("aggregate",), doc=_d))


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the generalization CUBE/ROLLUP compile
    to): per-status totals, per-priority totals, and the grand total in
    one pass — Spark plans a single Expand + aggregate, no re-scan per
    set."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            round2(F.sum(dec("o_totalprice"))).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2)::DOUBLE AS total,
       CAST(count(*) AS BIGINT) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""

register(
    QuerySpec(
        name="grouping_sets_revenue",
        build=grouping_sets_revenue,
        oracle=GROUPING_SETS_SQL,
        tags=("aggregate",),
        doc="explicit GROUPING SETS single-pass multi-level totals",
    )
)
