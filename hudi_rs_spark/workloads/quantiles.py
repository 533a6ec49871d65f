"""Percentile/quantile + fuzzy-match workload queries, oracle-checked.

Percentiles: Spark's exact ``percentile`` and DuckDB's ``quantile_cont``
share the textbook linear-interpolation definition (lower + frac *
(upper - lower) over the sorted values), so continuous quantiles over the
same doubles are bit-identical.

Fuzzy dedup: Levenshtein distance is an exact integer both engines
implement identically; candidate pairs are blocked on (lang, prefix
bucket) so the pair join stays an equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hudi_rs_spark.workloads import QuerySpec, register
from hudi_rs_spark.workloads.tables import load


def q_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median / p90 / p99 of extended price per return flag — exact
    percentile is a single groupBy (sort happens inside the aggregate
    buffer per group; the shuffle carries raw values per group, so at
    true scale switch to approx_percentile with a bounded error)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
            F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


def q_price_percentiles_approx(
    spark: SparkSession, sf_dir: str, accuracy: int = 10000
) -> DataFrame:
    """The SCALE path for q_price_percentiles: ``approx_percentile``
    (Greenwald-Khanna sketch) replaces the exact aggregate. The exact
    form shuffles every raw value to its group's reducer — unbounded
    per-group state at 100 TB; the sketch keeps O(accuracy) state per
    group, combines map-side, and bounds rank error by 1/accuracy.
    Not registered in the driver gate (a sketch has no bit-exact SQL
    oracle); tests/test_skew_approx.py pins it to the exact result
    within tolerance, same pattern as approx_count_distinct."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                f"approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), {accuracy})"
            ).alias("pcts"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "l_returnflag",
            F.col("pcts")[0].alias("p50"),
            F.col("pcts")[1].alias("p90"),
            F.col("pcts")[2].alias("p99"),
            "n",
        )
        .orderBy("l_returnflag")
    )


PERCENTILES_SQL = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50,
       quantile_cont(l_extendedprice, 0.9) AS p90,
       quantile_cont(l_extendedprice, 0.99) AS p99,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# shared normalized prefix used for blocking + distance
_PREFIX_LEN = 24
_MAX_DIST = 6


def dedup_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by Levenshtein distance over the normalized text
    prefix, blocked on (lang, n_chars bucket): the candidate join is an
    equi-join, never all-pairs."""
    from hudi_rs_spark.operators.dedup import normalized

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.floor(F.col("n_chars") / 50).cast("bigint").alias("bucket"),
        F.substring(normalized(F.col("text")), 1, _PREFIX_LEN).alias("prefix"),
    )
    # Materialize before the self-join (no cross-side exchange reuse):
    # one normalization pass instead of two.
    d = d.localCheckpoint(eager=True)
    a = d.select(
        F.col("doc_id").alias("id_a"), "lang", "bucket", F.col("prefix").alias("pa")
    )
    b = d.select(
        F.col("doc_id").alias("id_b"), "lang", "bucket", F.col("prefix").alias("pb")
    )
    dist = F.levenshtein("pa", "pb")
    return (
        a.join(b, ["lang", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist.alias("dist"))
        .filter(F.col("dist") <= _MAX_DIST)
        .orderBy("id_a", "id_b")
    )


FUZZY_SQL = f"""
WITH d AS (
  SELECT doc_id, lang,
         CAST(floor(n_chars / 50) AS BIGINT) AS bucket,
         substring(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), 1, {_PREFIX_LEN}) AS prefix
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.prefix, b.prefix) AS INTEGER) AS dist
FROM d a JOIN d b ON a.lang = b.lang AND a.bucket = b.bucket AND a.doc_id < b.doc_id
WHERE levenshtein(a.prefix, b.prefix) <= {_MAX_DIST}
ORDER BY id_a, id_b
"""


for _n, _f, _s, _d in [
    ("q_price_percentiles", q_price_percentiles, PERCENTILES_SQL, "exact continuous quantiles"),
    ("dedup_fuzzy_levenshtein", dedup_fuzzy_levenshtein, FUZZY_SQL, "edit-distance near-dup"),
]:
    register(QuerySpec(name=_n, build=_f, oracle=_s, tags=("quantiles",), doc=_d))
