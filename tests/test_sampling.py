"""Sampling operators (operators/sampling.py): determinism, rate
accuracy, mix feasibility, and the no-shuffle plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from hudi_rs_spark.operators import sampling as S

SF = "/root/testdata/sf0.01"


def _docs(spark):
    from hudi_rs_spark.workloads.tables import load

    return load(spark, SF, "documents")


class TestHashSample:
    def test_rate_within_tolerance(self, spark):
        d = _docs(spark)
        n = d.count()
        got = S.hash_sample(d, "doc_id", 0.4).count()
        assert abs(got / n - 0.4) < 0.1

    def test_deterministic_and_nested(self, spark):
        d = _docs(spark)
        a = sorted(r["doc_id"] for r in S.hash_sample(d, "doc_id", 0.3).select("doc_id").collect())
        b = sorted(r["doc_id"] for r in S.hash_sample(d, "doc_id", 0.3).select("doc_id").collect())
        assert a == b
        # smaller fraction with the same salt is a subset (thresholds nest)
        c = set(r["doc_id"] for r in S.hash_sample(d, "doc_id", 0.1).select("doc_id").collect())
        assert c <= set(a)

    def test_no_shuffle_plan(self, spark):
        d = _docs(spark)
        plan = S.hash_sample(d, "doc_id", 0.5)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_salt_decorrelates(self, spark):
        d = _docs(spark)
        a = set(r["doc_id"] for r in S.hash_sample(d, "doc_id", 0.5, salt="a").select("doc_id").collect())
        b = set(r["doc_id"] for r in S.hash_sample(d, "doc_id", 0.5, salt="b").select("doc_id").collect())
        assert a != b


class TestStratified:
    def test_fractions_respected(self, spark):
        d = _docs(spark)
        out = (
            S.stratified_sample(d, "doc_id", "source", {"src0": 1.0, "src1": 0.0}, default=0.2)
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        got = {r["source"]: r["n"] for r in out.collect()}
        assert got["src0"] == 25  # fraction 1.0 keeps every row
        assert "src1" not in got  # fraction 0.0 keeps none
        # default strata thinned to ~20%
        rest = [v for k, v in got.items() if k not in ("src0", "src1")]
        assert all(v < 15 for v in rest) and sum(rest) > 0


class TestProportionalMix:
    def test_shares_and_feasibility(self, spark):
        d = _docs(spark)
        targets = {"en": 0.4, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15}
        out = S.proportional_mix(d, "doc_id", "lang", targets)
        counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
        orig = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
        # never oversamples a stratum
        assert all(counts[k] <= orig[k] for k in counts)
        # binding stratum (min count/p) is kept whole
        binding = min(orig, key=lambda k: orig[k] / targets[k])
        assert counts[binding] == orig[binding]
        # achieved shares approximate targets (hash granularity tolerance)
        total = sum(counts.values())
        for k, p in targets.items():
            assert abs(counts[k] / total - p) < 0.08

    def test_untargeted_strata_dropped(self, spark):
        d = _docs(spark)
        out = S.proportional_mix(d, "doc_id", "lang", {"en": 0.6, "de": 0.4})
        langs = {r["lang"] for r in out.select("lang").distinct().collect()}
        assert langs <= {"en", "de"}


class TestPackSequences:
    def test_offsets_and_overrun_bound(self, spark):
        from hudi_rs_spark.operators.packing import pack_sequences

        rows = [(i, "s", t) for i, t in enumerate([300, 300, 300, 300, 50, 600])]
        df = spark.createDataFrame(rows, ["id", "src", "toks"])
        out = {r["id"]: r.asDict() for r in pack_sequences(df, "id", "toks", 500, "src").collect()}
        # running offsets in id order
        assert [out[i]["start_offset"] for i in range(6)] == [0, 300, 600, 900, 1200, 1250]
        # shard = start div capacity
        assert [out[i]["shard"] for i in range(6)] == [0, 0, 1, 1, 2, 2]

    def test_streams_independent(self, spark):
        from hudi_rs_spark.operators.packing import pack_sequences

        rows = [(1, "a", 400), (2, "b", 400), (3, "a", 400), (4, "b", 400)]
        df = spark.createDataFrame(rows, ["id", "src", "toks"])
        out = {r["id"]: r.asDict() for r in pack_sequences(df, "id", "toks", 500, "src").collect()}
        # each stream starts at offset 0
        assert out[1]["start_offset"] == 0 and out[2]["start_offset"] == 0
        assert out[3]["shard"] == 0 and out[3]["start_offset"] == 400


class TestTemperatureMix:
    def test_smallest_stratum_kept_whole(self, spark):
        d = _docs(spark)
        base = {r["lang"]: r["cnt"] for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
        out = S.temperature_mix(d, "doc_id", "lang", alpha=0.5)
        got = {r["lang"]: r["cnt"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
        smallest = min(base, key=base.get)
        assert got[smallest] == base[smallest]

    def test_rates_match_closed_form(self, spark):
        import math

        d = _docs(spark)
        base = {r["lang"]: r["cnt"] for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
        got = {r["lang"]: r["cnt"] for r in S.temperature_mix(d, "doc_id", "lang", alpha=0.5).groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
        mn = min(base.values())
        for lang, cnt in base.items():
            expect = math.sqrt(mn / cnt) * cnt
            # md5-threshold sampling: binomial noise around the exact rate
            assert abs(got.get(lang, 0) - expect) < 4 * math.sqrt(expect) + 5, lang

    def test_alpha_one_is_identity(self, spark):
        d = _docs(spark)
        # alpha=1 -> rate = (min/cnt)^0 = 1 for every stratum
        assert S.temperature_mix(d, "doc_id", "lang", alpha=1.0).count() == d.count()

    def test_alpha_out_of_range_rejected(self, spark):
        import pytest

        d = _docs(spark)
        # alpha > 1 would make every threshold exceed 2^32 (silent no-op
        # instead of upsampling); alpha < 0 over-flattens silently
        with pytest.raises(ValueError, match="alpha"):
            S.temperature_mix(d, "doc_id", "lang", alpha=1.5)
        with pytest.raises(ValueError, match="alpha"):
            S.temperature_mix(d, "doc_id", "lang", alpha=-0.1)

    def test_flattens_toward_uniform(self, spark):
        d = _docs(spark)
        base = {r["lang"]: r["cnt"] for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
        got = {r["lang"]: r["cnt"] for r in S.temperature_mix(d, "doc_id", "lang", alpha=0.5).groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
        # spread (max/min ratio) must strictly shrink
        spread = lambda m: max(m.values()) / max(1, min(m.values()))
        assert spread(got) < spread(base)


class TestShuffleShard:
    def test_positions_dense_and_deterministic(self, spark):
        d = _docs(spark)
        out = S.shuffle_shard(d, "doc_id", n_shards=8)
        rows = out.select("doc_id", "shard", "pos").collect()
        assert len(rows) == d.count()
        by_shard = {}
        for r in rows:
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        assert set(by_shard) <= set(range(8))
        for shard, ps in by_shard.items():
            assert sorted(ps) == list(range(1, len(ps) + 1)), shard
        again = S.shuffle_shard(d, "doc_id", n_shards=8).select("doc_id", "shard", "pos").collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    def test_order_is_scrambled_not_sorted(self, spark):
        d = _docs(spark)
        out = S.shuffle_shard(d, "doc_id", n_shards=2)
        ids_in_order = [r["doc_id"] for r in out.orderBy("shard", "pos").collect()]
        assert ids_in_order != sorted(ids_in_order)

    def test_single_exchange_plan(self, spark):
        d = _docs(spark)
        plan = S.shuffle_shard(d, "doc_id", 8)._jdf.queryExecution().executedPlan().toString()
        # one hash-partition exchange on shard for the window; nothing else
        assert plan.count("Exchange") == 1


class TestLeakageFreeSplit:
    def test_clusters_never_straddle(self, spark):
        # chain 1-2-3 plus pair (10,11): whole clusters must share a split
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
        )
        docs = spark.createDataFrame([(i,) for i in range(1, 21)], ["doc_id"])
        out = {r["doc_id"]: r.asDict() for r in S.leakage_free_split(
            docs, "doc_id", pairs, frac_train=0.5
        ).collect()}
        assert len(out) == 20
        assert out[1]["canon_id"] == out[2]["canon_id"] == out[3]["canon_id"] == 1
        assert out[1]["split"] == out[2]["split"] == out[3]["split"]
        assert out[10]["split"] == out[11]["split"]
        # singletons are their own canon
        assert out[7]["canon_id"] == 7
        # both splits actually populated at frac=0.5 over 20 docs
        splits = {v["split"] for v in out.values()}
        assert splits == {"train", "val"}

    def test_split_rate_tracks_fraction(self, spark):
        docs = _docs(spark)
        pairs = docs.sparkSession.createDataFrame([], "id_a long, id_b long")
        out = S.leakage_free_split(docs.select("doc_id"), "doc_id", pairs, 0.8)
        n = docs.count()
        n_train = out.filter(F.col("split") == "train").count()
        assert abs(n_train / n - 0.8) < 0.08
