"""pin() backend selection: localCheckpoint vs reliable df.checkpoint.

VERDICT r12 "what's wrong #2": the iterative operators pinned rounds
with localCheckpoint(eager=True) unconditionally — non-replicated
executor blocks that cannot be recomputed after an executor loss at
cluster scale.  pin() makes the backend configurable; these tests run
representative iterative operators under BOTH backends and require
identical results, and pin the selection rules themselves.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hudi_rs_spark.operators.pin import CHECKPOINT_DIR_CONF, pin


@pytest.fixture
def reliable_dir(spark, tmp_path):
    """Force the reliable backend for the duration of one test, then
    restore the explicit-local override (the SparkContext checkpoint
    dir cannot be unset, so '' keeps later tests on localCheckpoint)."""
    d = str(tmp_path / "ckpt")
    spark.conf.set(CHECKPOINT_DIR_CONF, d)
    yield d
    spark.conf.set(CHECKPOINT_DIR_CONF, "")


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "a completely different document about spark query planning"),
        (4, "the quick brown fox jumps over the lazy dog once more now"),
        (5, "short text"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _vecs(spark):
    rows = [(i, [float(i % 3), float((i * 7) % 5), float(i % 2)]) for i in range(30)]
    return spark.createDataFrame(rows, ["id", "v"]).select(
        "id", F.col("v").cast("array<float>").alias("v")
    )


def _tree_files(root):
    return [
        os.path.join(dp, f) for dp, _, fs in os.walk(root) for f in fs
    ]


class TestBackendSelection:
    def test_default_is_local(self, spark):
        # conf is '' (explicit local) or unset with no ctx dir -> local
        df = pin(spark.range(5))
        assert df.count() == 5

    def test_conf_dir_selects_reliable(self, spark, reliable_dir):
        df = pin(spark.range(7))
        assert df.count() == 7
        # checkpoint blocks actually landed in the configured dir
        assert _tree_files(reliable_dir)

    def test_empty_conf_overrides_ctx_dir(self, spark, tmp_path):
        # even with a context checkpoint dir installed, conf='' pins local
        ctx = str(tmp_path / "ctx")
        spark.sparkContext.setCheckpointDir(ctx)
        spark.conf.set(CHECKPOINT_DIR_CONF, "")
        df = pin(spark.range(3))
        assert df.count() == 3
        # nothing was written reliably — the local backend was used
        assert not _tree_files(ctx)


class TestOperatorParityAcrossBackends:
    """The same operator under both backends returns identical rows."""

    def _run_cc(self, spark):
        from hudi_rs_spark.operators.graph import connected_components

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (3, 4)], ["src", "dst"]
        )
        return sorted(
            (r.node, r.component)
            for r in connected_components(edges, "src", "dst").collect()
        )

    def _run_kmeans(self, spark):
        from hudi_rs_spark.operators.clustering import kmeans_assign

        out = kmeans_assign(_vecs(spark), "id", "v", k=3, iterations=3)
        return sorted((r.id, r.cid) for r in out.collect())

    def _run_minhash(self, spark):
        from hudi_rs_spark.operators.dedup import minhash_lsh_pairs

        out = minhash_lsh_pairs(_docs(spark), "text", "doc_id")
        return sorted((r.id_a, r.id_b) for r in out.collect())

    @pytest.mark.parametrize("op", ["cc", "kmeans", "minhash"])
    def test_parity(self, spark, tmp_path, op):
        run = {"cc": self._run_cc, "kmeans": self._run_kmeans,
               "minhash": self._run_minhash}[op]
        spark.conf.set(CHECKPOINT_DIR_CONF, "")
        local = run(spark)
        spark.conf.set(CHECKPOINT_DIR_CONF, str(tmp_path / "ckpt"))
        try:
            reliable = run(spark)
        finally:
            spark.conf.set(CHECKPOINT_DIR_CONF, "")
        assert local == reliable
        assert local  # non-trivial result
