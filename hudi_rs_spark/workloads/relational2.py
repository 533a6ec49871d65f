"""Second relational batch: market share, distribution histogram,
multi-semi-join shapes, JSON extraction — rounding out SURVEY §2.B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hudi_rs_spark.workloads import QuerySpec, register
from hudi_rs_spark.workloads.tables import load
from hudi_rs_spark.workloads.sqlutil import SQL_DISC_PRICE, dec, disc_price, round2


def _b(df: DataFrame) -> DataFrame:
    return F.broadcast(df)


# --------------------------------------------------------------------------
# q8-ish: market share of one nation within a region per year
# (numerator/denominator kept separate; see sqlutil determinism rules)
# --------------------------------------------------------------------------
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n = load(spark, sf_dir, "nation")
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") <= F.lit("1997-12-31"))
    )
    l = load(spark, sf_dir, "lineitem")
    brazil_vol = F.when(F.col("supp_nation") == "BRAZIL", disc_price()).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(_b(c), o.o_custkey == c.c_custkey)
        .join(_b(n), c.c_nationkey == n.n_nationkey)
        .join(_b(r), n.n_regionkey == r.r_regionkey)
        .join(_b(s), l.l_suppkey == s.s_suppkey)
        .join(_b(n2), s.s_nationkey == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            round2(F.sum(brazil_vol)).alias("brazil_volume"),
            round2(F.sum(disc_price())).alias("total_volume"),
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
       ROUND(SUM(CASE WHEN n2.n_name = 'BRAZIL' THEN {SQL_DISC_PRICE}
                      ELSE CAST(0 AS DECIMAL(18,6)) END), 2)::DOUBLE AS brazil_volume,
       ROUND(SUM({SQL_DISC_PRICE}), 2)::DOUBLE AS total_volume
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'AMERICA'
  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
GROUP BY o_year
ORDER BY o_year
"""


# --------------------------------------------------------------------------
# q13: customer order-count distribution (left outer join + double group)
# --------------------------------------------------------------------------
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        ~F.col("o_orderpriority").startswith("4")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '4%'
      GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --------------------------------------------------------------------------
# q20-ish: suppliers who shipped > 100 units of 'red' parts (double semi)
# --------------------------------------------------------------------------
def q20_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_name").startswith("red"))
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    heavy = (
        l.join(_b(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("qty_dec"))
        .filter(F.col("qty_dec") > 100)
        .select("l_suppkey")
    )
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(_b(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


Q20_SQL = """
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 100)
ORDER BY s_name
"""


# --------------------------------------------------------------------------
# q21-ish: suppliers with late shipments on multi-line orders
# --------------------------------------------------------------------------
def q21_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    late = l.join(o, l.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)
    )
    multi = (
        l.groupBy(F.col("l_orderkey").alias("mk"))
        .agg(F.countDistinct("l_suppkey").alias("nsupp"))
        .filter(F.col("nsupp") > 1)
        .select("mk")
    )
    return (
        late.join(multi, late.l_orderkey == multi.mk, "left_semi")
        .join(_b(s), late.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


Q21_SQL = """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM lineitem l
JOIN orders ON l.l_orderkey = o_orderkey
JOIN supplier ON l.l_suppkey = s_suppkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND l.l_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
    HAVING count(DISTINCT l_suppkey) > 1)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# --------------------------------------------------------------------------
# JSON extraction over events.props (map/JSON function category)
# --------------------------------------------------------------------------
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


JSON_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS min_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


for _n, _f, _s, _d in [
    ("q8_market_share", q8_market_share, Q8_SQL, "tpch:q8 7-way join share"),
    ("q13_order_distribution", q13_order_distribution, Q13_SQL, "tpch:q13 outer join histogram"),
    ("q20_heavy_suppliers", q20_heavy_suppliers, Q20_SQL, "tpch:q20 semi over agg"),
    ("q21_late_suppliers", q21_late_suppliers, Q21_SQL, "tpch:q21 multi-cond semi"),
    ("json_props_stats", json_props_stats, JSON_SQL, "JSON extraction + agg"),
]:
    register(QuerySpec(name=_n, build=_f, oracle=_s, tags=("relational",), doc=_d))
