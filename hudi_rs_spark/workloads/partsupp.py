"""q2/q11-shaped workloads over a SYNTHESIZED partsupp table.

The reference proves all 22 TPC-H queries (benchmark/tpch/queries/
q2.sql, q11.sql), but the driver testdata ships no partsupp table — so
these queries synthesize one deterministically from part x supplier
with closed-form arithmetic that both Spark and DuckDB evaluate
identically, and are verified by the SAME differential oracle harness
as the registry queries (tests/test_partsupp.py). They are deliberately
NOT registered in __spark_entry__.queries(): the driver's DuckDB views
have no partsupp, so registry exposure would fail its gate on a data
gap, not a code gap.

Determinism: ps_supplycost has exactly 2 decimal digits; money math
stages through DECIMAL(18,6) before aggregation (exact, order-free)
and casts to DOUBLE only at the end — see oracle-determinism notes in
workloads/relational.py.

Scale: partsupp derives from part via two broadcast cross joins (a
1-row count and a 4-row generator) — no shuffle to build it; q2/q11
then shuffle on ps_partkey for their aggregates, broadcasting the
supplier/nation/region dimension chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hudi_rs_spark.workloads.tables import load

# one shared SQL text for the synthesized table: the DuckDB oracle uses
# this CTE verbatim, the Spark build mirrors it expression-for-expression
PARTSUPP_CTE = """
WITH gen AS (SELECT 0 AS i UNION ALL SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3),
sc AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM supplier),
partsupp AS (
  SELECT CAST(p_partkey AS BIGINT) AS ps_partkey,
         CAST((p_partkey * 37 + i * 1009) % cnt AS BIGINT) AS ps_suppkey,
         CAST((p_partkey * 7 + i * 13) % 9999 + 1 AS INTEGER) AS ps_availqty,
         CAST((p_partkey * 31 + i * 17) % 100000 AS DOUBLE) / 100 + 1.0 AS ps_supplycost
  FROM part CROSS JOIN sc CROSS JOIN gen
)
"""


def partsupp_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthesized partsupp as a DataFrame (mirrors PARTSUPP_CTE)."""
    part = load(spark, sf_dir, "part")
    cnt = (
        load(spark, sf_dir, "supplier")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    gen = spark.range(4).select(F.col("id").cast("int").alias("i"))
    p = F.col("p_partkey")
    return (
        part.crossJoin(F.broadcast(cnt))
        .crossJoin(F.broadcast(gen))
        .select(
            p.cast("bigint").alias("ps_partkey"),
            ((p * 37 + F.col("i") * 1009) % F.col("cnt"))
            .cast("bigint")
            .alias("ps_suppkey"),
            ((p * 7 + F.col("i") * 13) % 9999 + 1).cast("int").alias("ps_availqty"),
            (((p * 31 + F.col("i") * 17) % 100000).cast("double") / 100 + 1.0)
            .alias("ps_supplycost"),
        )
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 shape: for qualifying parts, the supplier(s) offering
    the REGION-minimum supply cost — correlated-min subquery as a
    groupBy + equi-join back. Dimension chain (supplier->nation->region)
    broadcasts; the only shuffle is the per-part min."""
    ps = partsupp_df(spark, sf_dir)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "PROMO")
    )
    dims = F.broadcast(
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costs = ps.join(dims, ps.ps_suppkey == dims.s_suppkey)
    min_cost = costs.groupBy("ps_partkey").agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        costs.join(min_cost, "ps_partkey")
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name",
            F.col("p_partkey").cast("bigint").alias("p_partkey"),
            "p_brand", "p_type",
            F.col("ps_supplycost").alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = PARTSUPP_CTE + """
, costs AS (
  SELECT ps.ps_partkey, ps.ps_supplycost, s.s_acctbal, s.s_name, n.n_name
  FROM partsupp ps
  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
),
mc AS (SELECT ps_partkey, min(ps_supplycost) AS min_cost FROM costs GROUP BY ps_partkey)
SELECT c.s_acctbal, c.s_name, c.n_name,
       CAST(p.p_partkey AS BIGINT) AS p_partkey, p.p_brand, p.p_type,
       c.ps_supplycost AS supplycost
FROM costs c
JOIN mc ON c.ps_partkey = mc.ps_partkey AND c.ps_supplycost = mc.min_cost
JOIN part p ON c.ps_partkey = p.p_partkey
WHERE p.p_size <= 15 AND p.p_type = 'PROMO'
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 shape: per-part inventory value within one nation,
    kept when above a fraction of the nation's total. The nation is
    picked data-driven (most suppliers, name tiebreak) so the query is
    non-empty at every scale factor; money stages through DECIMAL(18,6)
    (exact, order-free) so the grand-total comparison hash-matches
    DuckDB."""
    ps = partsupp_df(spark, sf_dir)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    s_n = s.join(n, s.s_nationkey == n.n_nationkey).select("s_suppkey", "n_name")
    top = (
        s_n.groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "n_name")
        .limit(1)
        .select("n_name")
    )
    dims = F.broadcast(s_n.join(F.broadcast(top), "n_name").select("s_suppkey"))
    value = (
        F.col("ps_supplycost").cast("decimal(18,6)") * F.col("ps_availqty")
    )
    scoped = ps.join(dims, ps.ps_suppkey == dims.s_suppkey).select(
        "ps_partkey", value.alias("v")
    )
    per_part = scoped.groupBy("ps_partkey").agg(F.sum("v").alias("value_dec"))
    total = per_part.agg(
        (F.sum("value_dec").cast("double") * F.lit(0.0001)).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec").cast("double") > F.col("threshold"))
        .select(
            "ps_partkey", F.col("value_dec").cast("double").alias("value")
        )
        .orderBy(F.desc("value"), "ps_partkey")
    )


Q11_SQL = PARTSUPP_CTE + """
, top AS (
  SELECT n.n_name
  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY n.n_name ORDER BY count(*) DESC, n.n_name LIMIT 1
),
scoped AS (
  SELECT ps.ps_partkey,
         CAST(ps.ps_supplycost AS DECIMAL(18,6)) * ps.ps_availqty AS v
  FROM partsupp ps
  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN top t ON n.n_name = t.n_name
),
per_part AS (SELECT ps_partkey, sum(v) AS value_dec FROM scoped GROUP BY ps_partkey),
tot AS (SELECT CAST(sum(value_dec) AS DOUBLE) * 0.0001 AS threshold FROM per_part)
SELECT ps_partkey, CAST(value_dec AS DOUBLE) AS value
FROM per_part CROSS JOIN tot
WHERE CAST(value_dec AS DOUBLE) > threshold
ORDER BY value DESC, ps_partkey
"""
