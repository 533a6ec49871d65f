"""Auto-rescale for bucket tables
(write/bucket.py::rescale_oversized_buckets): every leaf whose total
live bytes exceed the target splits via the extendible-hash
split_bucket; bounded rounds, largest-first. The policy loop that keeps
a consistent-hashing table's buckets near target size as it grows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hudi_rs_spark.write.bucket import (
    parse_bucket_leaf,
    rescale_oversized_buckets,
    route_key,
)
from hudi_rs_spark.write.upsert import upsert


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from hudi_rs_spark.sources.pyds import HudiPyDataSource

    spark.dataSource.register(HudiPyDataSource)


N = 2
OPTS = {
    "recordkey.field": "id", "precombine.field": "ts",
    "table.type": "MERGE_ON_READ", "table.version": "8",
    "index.type": "bucket", "hoodie.bucket.index.num.buckets": str(N),
    "hoodie.table.name": "b",
}


def _keys_for_bucket(bucket, count, start=0):
    out, i = [], start
    while len(out) < count:
        if route_key(str(i), N)[0] == bucket:
            out.append(i)
        i += 1
    return out


def _seed_skewed(spark, path):
    """bucket 0 gets 400 fat rows, bucket 1 gets 10 small ones."""
    fat = _keys_for_bucket(0, 400)
    small = _keys_for_bucket(1, 10)
    upsert(
        spark.createDataFrame(
            # unique per-row long strings: dictionary/RLE can't squash
            # them, so the leaf's bytes reflect its row volume
            [(i, f"{i}:abcdefghijklmnop" * 120, 1) for i in fat]
            + [(i, "y", 1) for i in small],
            "id int, payload string, ts int",
        ),
        path,
        **OPTS,
    )
    from hudi_rs_spark.write.compact import compact

    compact(spark, path)  # bases so leaf sizes are honest
    return sorted(fat + small)


def _snap_ids(spark, path):
    return sorted(
        r.id
        for r in spark.read.format("hudi_py").option("path", path).load()
        .select("id").collect()
    )


def _leaves(spark, path):
    from hudi_rs_spark.sources.hudi import HudiTable

    return {
        parse_bucket_leaf(sl.file_id, N)
        for sl in HudiTable(path, spark).get_file_slices()
    }


class TestAutoRescale:
    def test_splits_only_oversized_leaf(self, spark, tmp_path):
        path = str(tmp_path / "t")
        expected = _seed_skewed(spark, path)
        done = rescale_oversized_buckets(spark, path, max_bucket_mb=0.05)
        assert done == [(0, N)]  # only the fat bucket
        leaves = _leaves(spark, path)
        assert (0, 2 * N) in leaves and (N, 2 * N) in leaves
        assert (1, N) in leaves  # small bucket untouched
        assert _snap_ids(spark, path) == expected
        # hash-routed upserts land in the children
        k = _keys_for_bucket(0, 1)[0]
        upsert(
            spark.createDataFrame(
                [(k, "updated", 2)], "id int, payload string, ts int"
            ),
            path,
        )
        got = (
            spark.read.format("hudi_py").option("path", path).load()
            .filter(F.col("id") == k).collect()
        )
        assert len(got) == 1 and got[0].payload == "updated"

    def test_noop_under_threshold(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed_skewed(spark, path)
        assert rescale_oversized_buckets(spark, path, max_bucket_mb=64) == []

    def test_max_splits_bounds_the_round(self, spark, tmp_path):
        path = str(tmp_path / "t")
        expected = _seed_skewed(spark, path)
        # threshold tiny: BOTH leaves oversized; the round is capped at 1
        # and the LARGEST leaf goes first
        done = rescale_oversized_buckets(
            spark, path, max_bucket_mb=1e-4, max_splits=1
        )
        assert done == [(0, N)]
        assert _snap_ids(spark, path) == expected

    def test_validation(self, spark, tmp_path):
        path = str(tmp_path / "t")
        df = spark.createDataFrame([(1, "a", 1)], "id int, payload string, ts int")
        (
            df.write.format("hudi_py").option("path", path)
            .option("recordkey.field", "id")
            .option("precombine.field", "ts")
            .option("table.type", "MERGE_ON_READ")
            .option("table.version", "8")
            .mode("append").save()
        )
        with pytest.raises(ValueError, match="bucket-index"):
            rescale_oversized_buckets(spark, path, max_bucket_mb=1)
        with pytest.raises(ValueError, match="positive"):
            rescale_oversized_buckets(spark, path, max_bucket_mb=0)

    def test_call_procedure(self, spark, tmp_path):
        from hudi_rs_spark.write.sql import hudi_sql

        path = str(tmp_path / "t")
        expected = _seed_skewed(spark, path)
        done = hudi_sql(
            spark,
            "CALL rescale_buckets(table => 't', max_bucket_mb => 0.05)",
            tables={"t": path},
        ).collect()
        assert [(r.bucket, r.modulus) for r in done] == [(0, N)]
        assert _snap_ids(spark, path) == expected


class TestBatchedRound:
    def _replacecommits(self, path):
        import os

        tl = os.path.join(path, ".hoodie", "timeline")
        return sorted(
            n for n in os.listdir(tl) if n.endswith(".replacecommit")
        )

    def test_round_is_one_replacecommit(self, spark, tmp_path):
        """r14: a rescale round splits EVERY oversized leaf in ONE
        batched replacecommit (one snapshot read, one shuffle, one MDT
        fold) instead of a commit per leaf — data and routing identical
        to the sequential shape."""
        path = str(tmp_path / "t")
        expected = _seed_skewed(spark, path)
        before = self._replacecommits(path)
        done = rescale_oversized_buckets(spark, path, max_bucket_mb=1e-4)
        assert sorted(done) == [(0, N), (1, N)]  # both leaves oversized
        after = self._replacecommits(path)
        assert len(after) == len(before) + 1, (before, after)
        leaves = _leaves(spark, path)
        assert {(0, 2 * N), (N, 2 * N), (1, 2 * N), (1 + N, 2 * N)} <= leaves
        assert _snap_ids(spark, path) == expected
        # routed upserts descend the grown trie into the children
        k0 = _keys_for_bucket(0, 1)[0]
        k1 = _keys_for_bucket(1, 1)[0]
        upsert(
            spark.createDataFrame(
                [(k0, "u0", 2), (k1, "u1", 2)],
                "id int, payload string, ts int",
            ),
            path,
        )
        got = {
            r.id: r.payload
            for r in spark.read.format("hudi_py").option("path", path)
            .load().filter(F.col("id").isin(k0, k1)).collect()
        }
        assert got == {k0: "u0", k1: "u1"}

    def test_multi_leaf_split_matches_sequential(self, spark, tmp_path):
        """split_buckets([(a), (b)]) produces the same snapshot and the
        same leaf set as two sequential split_bucket calls."""
        from hudi_rs_spark.write.bucket import split_bucket, split_buckets

        p_seq = str(tmp_path / "seq")
        p_bat = str(tmp_path / "bat")
        expected = _seed_skewed(spark, p_seq)
        _seed_skewed(spark, p_bat)
        split_bucket(spark, p_seq, 0)
        split_bucket(spark, p_seq, 1)
        split_buckets(spark, p_bat, [(0, None), (1, None)])
        assert _leaves(spark, p_bat) == _leaves(spark, p_seq)
        assert _snap_ids(spark, p_bat) == expected
        assert _snap_ids(spark, p_seq) == expected
