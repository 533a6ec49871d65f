"""Unit semantics for the temporal join operators and decontamination:
exact-time matches, no-match nulls, interval boundary in/exclusivity,
bucket-straddling intervals, and short-document gram handling."""

from __future__ import annotations

import datetime as dt


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


class TestAsofJoin:
    def _run(self, spark, left_rows, right_rows):
        from hudi_rs_spark.operators.temporal import asof_join

        left = spark.createDataFrame(left_rows, "k int, ts timestamp, ev string")
        right = spark.createDataFrame(right_rows, "k int, rts timestamp, payload string")
        out = asof_join(left, right, on="k", left_time="ts",
                        right_time="rts", payload=["payload"])
        return {(r["k"], r["ev"]): r["payload"] for r in out.collect()}

    def test_backward_fill_and_exact_match(self, spark):
        got = self._run(
            spark,
            [
                (1, _ts("2024-01-05"), "before_any"),
                (1, _ts("2024-01-10"), "exact"),
                (1, _ts("2024-01-15"), "between"),
                (1, _ts("2024-02-01"), "after_all"),
            ],
            [(1, _ts("2024-01-10"), "p10"), (1, _ts("2024-01-20"), "p20")],
        )
        assert got == {
            (1, "before_any"): None,  # left as-of: no earlier right row
            (1, "exact"): "p10",      # at-or-before includes the exact instant
            (1, "between"): "p10",
            (1, "after_all"): "p20",
        }

    def test_keys_do_not_leak_across(self, spark):
        got = self._run(
            spark,
            [(1, _ts("2024-01-10"), "a"), (2, _ts("2024-01-10"), "b")],
            [(1, _ts("2024-01-01"), "k1_only")],
        )
        assert got == {(1, "a"): "k1_only", (2, "b"): None}


class TestRangeJoin:
    def _run(self, spark, probe_rows, build_rows, window_seconds):
        from hudi_rs_spark.operators.temporal import range_join

        probe = spark.createDataFrame(probe_rows, "k int, ts timestamp, ev string")
        build = spark.createDataFrame(build_rows, "bk int, start timestamp, tag string")
        out = range_join(probe, build, on=("k", "bk"), probe_time="ts",
                         build_start="start", window_seconds=window_seconds)
        return {(r["ev"], r["tag"]) for r in out.collect()}

    def test_boundaries_start_inclusive_end_exclusive(self, spark):
        day = 86400
        got = self._run(
            spark,
            [
                (1, _ts("2024-01-10T00:00:00"), "at_start"),
                (1, _ts("2024-01-16T23:59:59"), "last_second"),
                (1, _ts("2024-01-17T00:00:00"), "at_end"),
                (1, _ts("2024-01-09T23:59:59"), "before"),
            ],
            [(1, _ts("2024-01-10T00:00:00"), "w")],
            7 * day,
        )
        assert got == {("at_start", "w"), ("last_second", "w")}

    def test_bucket_straddling_interval_matches_once(self, spark):
        """An interval not aligned to bucket boundaries spans 2 buckets;
        every in-range probe matches exactly once (no dup pairs)."""
        from hudi_rs_spark.operators.temporal import range_join

        day = 86400
        probe = spark.createDataFrame(
            [(1, _ts("2024-01-12T12:00:00"), "e1"), (1, _ts("2024-01-18T00:00:00"), "e2")],
            "k int, ts timestamp, ev string",
        )
        build = spark.createDataFrame(
            [(1, _ts("2024-01-11T12:00:00"), "w")], "bk int, start timestamp, tag string"
        )
        rows = range_join(
            probe, build, on=("k", "bk"), probe_time="ts",
            build_start="start", window_seconds=7 * day,
        ).collect()
        assert sorted(r["ev"] for r in rows) == ["e1", "e2"]  # once each


class TestDecontaminate:
    def test_short_and_clean_docs_not_flagged(self, spark):
        from pyspark.sql import functions as F

        from hudi_rs_spark.operators.decontam import decontaminate

        rows = [
            (0, "the quick brown fox jumps over the lazy dog"),   # eval
            (1, "the quick brown fox jumps somewhere else now"),  # shares 13-gram
            (2, "completely unrelated content with no overlap"),  # clean
            (3, "tiny"),                                          # < 13 chars
            (97 * 2, "another eval document entirely"),           # eval
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = decontaminate(df, "text", "doc_id", F.col("doc_id") % 97 == 0, n=13)
        got = {r["doc_id"]: r["n_shared"] for r in out.collect()}
        assert 1 in got and got[1] >= 1
        assert set(got) == {1}  # eval docs, clean docs, short docs absent

    def test_gram_count_distinct_within_doc(self, spark):
        from pyspark.sql import functions as F

        from hudi_rs_spark.operators.decontam import decontaminate

        # doc 1 repeats the contaminating phrase twice -> the shared
        # grams are counted DISTINCT, not per occurrence
        rows = [
            (0, "abcdefghijklm"),                       # eval: exactly one 13-gram
            (1, "abcdefghijklm abcdefghijklm"),         # repeats it
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = decontaminate(df, "text", "doc_id", F.col("doc_id") % 97 == 0, n=13)
        got = {r["doc_id"]: r["n_shared"] for r in out.collect()}
        assert got == {1: 1}


class TestBloomDecontam:
    def test_parity_with_exact_join(self, spark):
        from pyspark.sql import functions as F

        from hudi_rs_spark.operators.decontam import (
            decontaminate,
            decontaminate_bloom,
        )

        rows = [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps somewhere else now"),
            (2, "completely unrelated content with no overlap"),
            (3, "tiny"),
            (97, "shared eval phrase appears right here in full"),
            (4, "a shared eval phrase appears right here in full twice over"),
            (97 * 2, "another eval document entirely"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pred = F.col("doc_id") % 97 == 0
        exact = {
            r["doc_id"]: r["n_shared"]
            for r in decontaminate(df, "text", "doc_id", pred, n=13).collect()
        }
        bloom = {
            r["doc_id"]: r["n_shared"]
            for r in decontaminate_bloom(df, "text", "doc_id", pred, n=13).collect()
        }
        assert bloom == exact and 1 in exact and 4 in exact

    def test_exact_despite_forced_false_positives(self, spark):
        # a 1024-bit filter over hundreds of grams saturates -> nearly
        # every probe passes the bitset; the confirm join must still
        # reduce the result to the exact answer
        from pyspark.sql import functions as F

        from hudi_rs_spark.operators.decontam import (
            decontaminate,
            decontaminate_bloom,
        )

        rows = [(0, " ".join(f"evalword{i}" for i in range(60)))]
        rows += [
            (j, f"doc {j} body " + " ".join(f"trainword{j}x{i}" for i in range(40)))
            for j in range(1, 8)
        ]
        rows.append((8, "evalword3 evalword4 evalword5 evalword6"))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pred = F.col("doc_id") == 0
        exact = {
            r["doc_id"]: r["n_shared"]
            for r in decontaminate(df, "text", "doc_id", pred, n=13).collect()
        }
        bloom = {
            r["doc_id"]: r["n_shared"]
            for r in decontaminate_bloom(
                df, "text", "doc_id", pred, n=13, bits_per_gram=1, k=2
            ).collect()
        }
        assert bloom == exact and 8 in exact

    def test_empty_eval_side(self, spark):
        from pyspark.sql import functions as F

        from hudi_rs_spark.operators.decontam import decontaminate_bloom

        df = spark.createDataFrame(
            [(1, "some training document body here")], "doc_id long, text string"
        )
        out = decontaminate_bloom(
            df, "text", "doc_id", F.col("doc_id") < 0, n=13
        )
        assert out.count() == 0

    def test_bitset_build_rejects_non_power_of_two(self, spark):
        import pytest

        from hudi_rs_spark.operators.decontam import build_gram_bloom

        grams = spark.createDataFrame([("abc",)], "gram string")
        with pytest.raises(ValueError, match="power of two"):
            build_gram_bloom(grams, m_bits=1000, k=4)


class TestInterdupScore:
    def test_hand_computed_fractions(self, spark):
        from hudi_rs_spark.operators.decontam import interdup_score

        rows = [
            (1, "abcdefgh"),   # grams: abcd bcde cdef defg efgh
            (2, "abcdzzzz"),   # grams: abcd bcdz cdzz dzzz zzzz -> shares abcd
            (3, "qqqqqq"),     # grams: qqqq(x3 distinct->1): qqqq only
            (4, "wxyz"),       # gram: wxyz (unique)
            (5, "qqqq"),       # gram: qqqq -> shared with doc 3
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {
            r["doc_id"]: r.asDict()
            for r in interdup_score(df, "text", "doc_id", n=4).collect()
        }
        assert out[1]["n_grams"] == 5 and out[1]["n_shared"] == 1
        assert out[1]["dup_frac"] == 1 / 5
        assert out[2]["n_grams"] == 5 and out[2]["n_shared"] == 1
        assert out[3] == {"doc_id": 3, "n_grams": 1, "n_shared": 1, "dup_frac": 1.0}
        assert out[4]["n_shared"] == 0 and out[4]["dup_frac"] == 0.0
        assert out[5]["n_shared"] == 1

    def test_doc_below_gram_length_absent(self, spark):
        from hudi_rs_spark.operators.decontam import interdup_score

        df = spark.createDataFrame([(1, "ab"), (2, "abcdef")], ["doc_id", "text"])
        out = interdup_score(df, "text", "doc_id", n=4)
        assert [r["doc_id"] for r in out.collect()] == [2]
