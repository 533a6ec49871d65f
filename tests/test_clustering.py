"""Deterministic integer k-means (operators/clustering.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hudi_rs_spark.operators.clustering import kmeans_assign

SF = "/root/testdata/sf0.01"


def _emb(spark):
    from hudi_rs_spark.workloads.tables import load

    return load(spark, SF, "embeddings")


class TestKMeans:
    def test_partitioning_invariance(self, spark):
        emb = _emb(spark)
        a = kmeans_assign(emb, "vec_id", "embedding", k=4, iterations=2).collect()
        b = kmeans_assign(
            emb.repartition(13, "label"), "vec_id", "embedding", k=4, iterations=2
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_every_row_assigned_once(self, spark):
        emb = _emb(spark)
        out = kmeans_assign(emb, "vec_id", "embedding", k=8, iterations=2)
        assert out.count() == emb.count()
        assert out.select("id").distinct().count() == emb.count()
        cids = {r["cid"] for r in out.select("cid").distinct().collect()}
        assert cids <= set(range(1, 9))

    def test_iterations_do_not_worsen_objective(self, spark):
        emb = _emb(spark)

        def sse(iters):
            out = kmeans_assign(emb, "vec_id", "embedding", k=8, iterations=iters)
            return out.agg(F.sum("dist2")).collect()[0][0]

        # Lloyd's objective is monotone non-increasing per full round
        assert sse(2) <= sse(0)

    def test_tight_synthetic_clusters_recovered(self, spark):
        # two well-separated blobs -> two clusters matching the blobs
        rows = [(i, [0.4] * 64) for i in range(10)] + [
            (i, [-0.4] * 64) for i in range(10, 20)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = kmeans_assign(df, "vec_id", "embedding", k=2, iterations=2).collect()
        by_blob = {}
        for r in out:
            by_blob.setdefault(r["id"] < 10, set()).add(r["cid"])
        assert len(by_blob[True]) == 1 and len(by_blob[False]) == 1
        assert by_blob[True] != by_blob[False]
        assert all(r["dist2"] == 0 for r in out)  # centroids land on the blobs
