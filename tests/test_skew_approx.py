"""Skew-operator + approximate-aggregate tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from hudi_rs_spark.operators.skew import salted_aggregate, top_frequent_keys
from hudi_rs_spark.workloads.tables import load


class TestSaltedAggregate:
    def test_matches_plain_groupby_on_skewed_data(self, spark):
        # heavily skewed: 90% of rows share one key
        df = spark.range(0, 10000).select(
            F.when(F.col("id") % 10 != 0, F.lit("HOT")).otherwise(
                F.concat(F.lit("k"), F.col("id"))
            ).alias("k"),
            (F.col("id") % 97).alias("v"),
        )
        salted = salted_aggregate(
            df, ["k"], {"s": ("sum", "v"), "n": ("count", "v"), "mx": ("max", "v")}
        )
        plain = df.groupBy("k").agg(
            F.sum("v").alias("s"), F.count("v").alias("n"), F.max("v").alias("mx")
        )
        a = sorted(map(tuple, salted.collect()))
        b = sorted(map(tuple, plain.collect()))
        assert a == b

    def test_unsupported_fn_rejected(self, spark):
        import pytest

        df = spark.range(10).select(F.lit("a").alias("k"), F.col("id").alias("v"))
        with pytest.raises(ValueError):
            salted_aggregate(df, ["k"], {"a": ("avg", "v")})

    def test_top_frequent_keys_finds_hot_key(self, spark):
        df = spark.range(0, 1000).select(
            F.when(F.col("id") < 900, F.lit("HOT")).otherwise(F.lit("COLD")).alias("k")
        )
        hot = top_frequent_keys(df, ["k"], threshold_ratio=0.5).collect()
        assert [r["k"] for r in hot] == ["HOT"]


class TestApproxDistinct:
    def test_approx_count_distinct_within_tolerance(self, spark, sf_dir):
        l = load(spark, sf_dir, "lineitem")
        exact = l.select(F.countDistinct("l_orderkey")).collect()[0][0]
        approx = l.select(
            F.approx_count_distinct("l_orderkey", rsd=0.02)
        ).collect()[0][0]
        assert abs(approx - exact) / exact < 0.1


class TestApproxPercentiles:
    def test_approx_percentiles_within_tolerance(self, spark, sf_dir):
        """Scale-path sketch vs the exact aggregate: every percentile
        within 1% relative error (accuracy=10000 bounds rank error at
        1e-4, far tighter than this assertion needs)."""
        from hudi_rs_spark.workloads.quantiles import (
            q_price_percentiles,
            q_price_percentiles_approx,
        )

        exact = {r["l_returnflag"]: r for r in q_price_percentiles(spark, sf_dir).collect()}
        approx = {
            r["l_returnflag"]: r
            for r in q_price_percentiles_approx(spark, sf_dir).collect()
        }
        assert set(exact) == set(approx)
        for flag, e in exact.items():
            a = approx[flag]
            assert a["n"] == e["n"]
            for p in ("p50", "p90", "p99"):
                assert abs(a[p] - e[p]) / e[p] < 0.01, (flag, p, a[p], e[p])
