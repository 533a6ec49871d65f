"""Relational capability battery: TPC-H-shaped queries adapted to the
driver's star schema (TESTDATA.md columns only).

These exercise the operator categories the reference *delegates* to its
host engine (SURVEY.md §2.B; the reference proves them via its TPC-H
harness, /root/reference/benchmark/tpch/queries/q*.sql): multi-way
hash/broadcast joins, semi/anti joins, hash aggregation with partial
combine, rollup, sort/limit (top-k), set ops, and scalar functions.

Scale notes (100 TB thinking):
- Every join against region/nation/supplier/part is explicitly
  ``F.broadcast`` — those dims are bounded or sub-linear, so no shuffle of
  the fact table on their account.
- Aggregations shuffle once on their group keys; Spark plans partial
  (map-side) aggregation automatically — verified via .explain() in
  tests/test_plans.py.
- Top-k (orderBy + limit) becomes TakeOrderedAndProject: no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hudi_rs_spark.operators.pin import pin
from hudi_rs_spark.workloads import QuerySpec, register
from hudi_rs_spark.workloads.tables import load
from hudi_rs_spark.workloads.sqlutil import (
    DEC,
    SQL_CHARGE,
    SQL_DISC_PRICE,
    charge,
    dec,
    disc_price,
    round2,
)


def _b(df: DataFrame) -> DataFrame:
    return F.broadcast(df)


# --------------------------------------------------------------------------
# q1: pricing summary report (TPC-H q1 shape — full lineitem agg)
# --------------------------------------------------------------------------
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2001-08-06"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            round2(F.sum(dec("l_quantity"))).alias("sum_qty"),
            round2(F.sum(dec("l_extendedprice"))).alias("sum_base_price"),
            round2(F.sum(disc_price())).alias("sum_disc_price"),
            round2(F.sum(charge())).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2)::DOUBLE AS sum_qty,
       ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2)::DOUBLE AS sum_base_price,
       ROUND(SUM({SQL_DISC_PRICE}), 2)::DOUBLE AS sum_disc_price,
       ROUND(SUM({SQL_CHARGE}), 2)::DOUBLE AS sum_charge,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-08-06 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# q3: shipping priority (join customer ⋈ orders ⋈ lineitem, top 10 revenue)
# --------------------------------------------------------------------------
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1997-03-15"))
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1997-03-15"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(_b(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(round2(F.sum(disc_price())).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       ROUND(SUM({SQL_DISC_PRICE}), 2)::DOUBLE AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --------------------------------------------------------------------------
# q5: local supplier volume (6-way join incl. region/nation broadcast)
# --------------------------------------------------------------------------
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(_b(s), l.l_suppkey == s.s_suppkey)
        .join(_b(c), (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(_b(n), c.c_nationkey == n.n_nationkey)
        .join(_b(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(round2(F.sum(disc_price())).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = f"""
SELECT n_name, ROUND(SUM({SQL_DISC_PRICE}), 2)::DOUBLE AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# --------------------------------------------------------------------------
# q6: forecast revenue change (pure scan + filter + agg; pushdown showcase)
# --------------------------------------------------------------------------
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(round2(F.sum(dec("l_extendedprice") * dec("l_discount"))).alias("revenue"))
    )


Q6_SQL = """
SELECT ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6))), 2)::DOUBLE AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# q7: volume shipping between nation pairs (two nation broadcasts + year extract)
# --------------------------------------------------------------------------
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") <= F.lit("1997-12-31"))
    )
    pairs = (F.col("supp_nation") == "FRANCE") & (F.col("cust_nation") == "GERMANY") | (
        F.col("supp_nation") == "GERMANY"
    ) & (F.col("cust_nation") == "FRANCE")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(_b(s), l.l_suppkey == s.s_suppkey)
        .join(_b(c), o.o_custkey == c.c_custkey)
        .join(_b(n1), s.s_nationkey == F.col("s_nkey"))
        .join(_b(n2), c.c_nationkey == F.col("c_nkey"))
        .filter(pairs)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(round2(F.sum(disc_price())).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
       ROUND(SUM({SQL_DISC_PRICE}), 2)::DOUBLE AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
  AND ((n1.n_name = 'FRANCE' AND n2.n_name = 'GERMANY')
    OR (n1.n_name = 'GERMANY' AND n2.n_name = 'FRANCE'))
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# --------------------------------------------------------------------------
# q9: product-type profit proxy by nation & year (part ⋈ lineitem ⋈ supplier ⋈ nation)
# --------------------------------------------------------------------------
def q9_product_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_name").contains("plate"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(_b(p), l.l_partkey == p.p_partkey)
        .join(_b(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(_b(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(round2(F.sum(disc_price())).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
       ROUND(SUM({SQL_DISC_PRICE}), 2)::DOUBLE AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%plate%'
GROUP BY n_name, o_year
ORDER BY nation, o_year DESC
"""


# --------------------------------------------------------------------------
# q10: returned-item reporting (top 20 customers by lost revenue)
# --------------------------------------------------------------------------
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(_b(c), o.o_custkey == c.c_custkey)
        .join(_b(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(round2(F.sum(disc_price())).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, n_name,
       ROUND(SUM({SQL_DISC_PRICE}), 2)::DOUBLE AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --------------------------------------------------------------------------
# q12-ish: order priority outcome by line status (CASE WHEN aggregation)
# --------------------------------------------------------------------------
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    high = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(high).cast("bigint").alias("high_line_count"),
            F.sum(F.lit(1) - high).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# --------------------------------------------------------------------------
# q14: promotion effect (numerator/denominator kept separate — see sqlutil)
# --------------------------------------------------------------------------
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01")) & (F.col("l_shipdate") < F.lit("1997-10-01"))
    )
    promo = F.when(F.col("p_type").startswith("PROMO"), disc_price()).otherwise(
        F.lit(0).cast(DEC)
    )
    return l.join(_b(p), l.l_partkey == p.p_partkey).agg(
        round2(F.sum(promo)).alias("promo_revenue"),
        round2(F.sum(disc_price())).alias("total_revenue"),
    )


Q14_SQL = f"""
SELECT ROUND(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {SQL_DISC_PRICE} ELSE CAST(0 AS DECIMAL(18,6)) END), 2)::DOUBLE AS promo_revenue,
       ROUND(SUM({SQL_DISC_PRICE}), 2)::DOUBLE AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
"""


# --------------------------------------------------------------------------
# q15: top supplier by revenue (agg + max-subquery shape)
# --------------------------------------------------------------------------
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = l.groupBy("l_suppkey").agg(F.sum(disc_price()).alias("total_rev_dec"))
    # rev feeds BOTH the max subquery and the join: without the pin the
    # filtered lineitem scan + aggregation executes twice (r14, guide §5
    # materialize reused subtrees). The pinned frame is one row per
    # supplier with Q1-1996 shipments — tiny vs the lineitem pass saved.
    rev = pin(rev)
    max_rev = rev.agg(F.max("total_rev_dec").alias("m"))
    return (
        rev.join(_b(max_rev), rev.total_rev_dec == F.col("m"))
        .join(_b(s), rev.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            round2(F.col("total_rev_dec")).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey, SUM({SQL_DISC_PRICE}) AS total_rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, ROUND(total_rev_dec, 2)::DOUBLE AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev_dec = (SELECT MAX(total_rev_dec) FROM revenue)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# q16-ish: part demand by brand/type/size with NOT-IN (anti) supplier filter
# --------------------------------------------------------------------------
def q16_part_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#21") & (~F.col("p_type").startswith("MEDIUM"))
    )
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(_b(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#21' AND p_type NOT LIKE 'MEDIUM%'
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
# q17-ish: small-quantity orders vs per-part average (correlated scalar agg)
# --------------------------------------------------------------------------
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    avg_qty = l.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_threshold")
    )
    return (
        l.join(_b(p), l.l_partkey == p.p_partkey)
        .join(avg_qty, l.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            round2(F.sum(dec("l_extendedprice"))).alias("total_price"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


Q17_SQL = """
SELECT ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2)::DOUBLE AS total_price,
       CAST(count(*) AS BIGINT) AS line_count
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN (SELECT l_partkey AS ap_partkey, avg(l_quantity) * 0.2 AS qty_threshold
      FROM lineitem GROUP BY l_partkey) a
  ON l_partkey = ap_partkey
WHERE p_brand = 'Brand#23' AND l_quantity < qty_threshold
"""


# --------------------------------------------------------------------------
# q18: large-volume customers (HAVING over join, top 100)
# --------------------------------------------------------------------------
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > 212)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(_b(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            round2(dec("o_totalprice")).alias("o_totalprice"),
            round2(F.col("sum_qty_dec")).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       ROUND(CAST(o_totalprice AS DECIMAL(18,6)), 2)::DOUBLE AS o_totalprice,
       ROUND(sum_qty_dec, 2)::DOUBLE AS sum_qty
FROM (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sum_qty_dec
      FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 212) t
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# --------------------------------------------------------------------------
# q19: discounted revenue under disjunctive multi-column predicates
# --------------------------------------------------------------------------
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    l = load(spark, sf_dir, "lineitem")
    cond = (
        (F.col("p_brand") == "Brand#12") & (F.col("l_quantity").between(1, 11)) & (F.col("p_size").between(1, 5))
    ) | (
        (F.col("p_brand") == "Brand#23") & (F.col("l_quantity").between(10, 20)) & (F.col("p_size").between(1, 10))
    ) | (
        (F.col("p_brand") == "Brand#14") & (F.col("l_quantity").between(20, 30)) & (F.col("p_size").between(1, 15))
    )
    return (
        l.join(_b(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(round2(F.sum(disc_price())).alias("revenue"))
    )


Q19_SQL = f"""
SELECT ROUND(SUM({SQL_DISC_PRICE}), 2)::DOUBLE AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#14' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
"""


# --------------------------------------------------------------------------
# q4-ish: orders with at least one late-shipped line (left-semi join)
# --------------------------------------------------------------------------
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01")) & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    l = load(spark, sf_dir, "lineitem")
    late = l.join(o, l.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)
    ).select("l_orderkey")
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# q22-ish: wealthy customers with no orders (scalar subquery + anti join)
# --------------------------------------------------------------------------
def q22_no_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("abal"))
    return (
        c.join(_b(avg_bal))
        .filter(F.col("c_acctbal") > F.col("abal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            round2(F.sum(dec("c_acctbal"))).alias("totacctbal"),
        )
        .orderBy("nationkey")
    )


Q22_SQL = """
SELECT c_nationkey AS nationkey,
       CAST(count(*) AS BIGINT) AS numcust,
       ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,6))), 2)::DOUBLE AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
ORDER BY nationkey
"""


# --------------------------------------------------------------------------
# rollup: revenue by (returnflag, linestatus) with subtotals
# --------------------------------------------------------------------------
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            round2(F.sum(disc_price())).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


ROLLUP_SQL = f"""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM({SQL_DISC_PRICE}), 2)::DOUBLE AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


# --------------------------------------------------------------------------
# set op: customers active in 1994 but not in 1995 (EXCEPT)
# --------------------------------------------------------------------------
def except_churned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    y94 = o.filter(F.year("o_orderdate") == 1994).select(F.col("o_custkey").alias("custkey"))
    y95 = o.filter(F.year("o_orderdate") == 1995).select(F.col("o_custkey").alias("custkey"))
    return y94.exceptAll(y95.distinct()).distinct().orderBy("custkey")


EXCEPT_SQL = """
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1994
EXCEPT
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
ORDER BY custkey
"""


# --------------------------------------------------------------------------
# scalar-function battery: substring, like, case, date math in one pass
# --------------------------------------------------------------------------
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.select(
            F.substring("o_orderpriority", 1, 1).alias("prio_code"),
            F.year("o_orderdate").alias("o_year"),
            F.month("o_orderdate").alias("o_month"),
            F.when(F.col("o_totalprice") > 200000, F.lit("big"))
            .when(F.col("o_totalprice") > 100000, F.lit("mid"))
            .otherwise(F.lit("small"))
            .alias("bucket"),
        )
        .groupBy("prio_code", "o_year", "o_month", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("prio_code", "o_year", "o_month", "bucket")
    )


SCALAR_SQL = """
SELECT substring(o_orderpriority, 1, 1) AS prio_code,
       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
       CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS o_month,
       CASE WHEN o_totalprice > 200000 THEN 'big'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'small' END AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM orders
GROUP BY prio_code, o_year, o_month, bucket
ORDER BY prio_code, o_year, o_month, bucket
"""


_SPECS = [
    ("q1_pricing_summary", q1_pricing_summary, Q1_SQL, "tpch:q1 scan+agg"),
    ("q3_shipping_priority", q3_shipping_priority, Q3_SQL, "tpch:q3 3-way join topk"),
    ("q4_order_priority", q4_order_priority, Q4_SQL, "tpch:q4 semi join / EXISTS"),
    ("q5_local_supplier_volume", q5_local_supplier_volume, Q5_SQL, "tpch:q5 6-way join"),
    ("q6_forecast_revenue", q6_forecast_revenue, Q6_SQL, "tpch:q6 filter pushdown"),
    ("q7_volume_shipping", q7_volume_shipping, Q7_SQL, "tpch:q7 self-dim join"),
    ("q9_product_revenue", q9_product_revenue, Q9_SQL, "tpch:q9 4-way join"),
    ("q10_returned_items", q10_returned_items, Q10_SQL, "tpch:q10 topk"),
    ("q12_priority_lines", q12_priority_lines, Q12_SQL, "tpch:q12 case-when agg"),
    ("q14_promo_revenue", q14_promo_revenue, Q14_SQL, "tpch:q14 conditional agg"),
    ("q15_top_supplier", q15_top_supplier, Q15_SQL, "tpch:q15 max subquery"),
    ("q16_part_demand", q16_part_demand, Q16_SQL, "tpch:q16 count distinct"),
    ("q17_small_quantity", q17_small_quantity, Q17_SQL, "tpch:q17 correlated avg"),
    ("q18_large_volume", q18_large_volume, Q18_SQL, "tpch:q18 having"),
    ("q19_disjunctive", q19_disjunctive, Q19_SQL, "tpch:q19 OR predicates"),
    ("q22_no_order_customers", q22_no_order_customers, Q22_SQL, "tpch:q22 anti join"),
    ("rollup_revenue", rollup_revenue, ROLLUP_SQL, "rollup/grouping-sets"),
    ("except_churned_customers", except_churned_customers, EXCEPT_SQL, "set op EXCEPT"),
    ("scalar_functions", scalar_functions, SCALAR_SQL, "scalar function battery"),
]

for _name, _fn, _sql, _doc in _SPECS:
    register(QuerySpec(name=_name, build=_fn, oracle=_sql, tags=("relational",), doc=_doc))
