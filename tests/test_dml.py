"""Predicate DML (write/dml.py) and bloom-filter backfill
(write/mdt_bloom.backfill_bloom_filters).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from hudi_rs_spark.sources.pyds import HudiPyDataSource

    spark.dataSource.register(HudiPyDataSource)


def _write(df, path, mode="append", **options):
    w = df.write.format("hudi_py").option("path", path)
    for k, v in options.items():
        w = w.option(k, v)
    w.mode(mode).save()


OPTS = {
    "recordkey.field": "id", "precombine.field": "ts",
    "partitionpath.field": "part", "table.type": "MERGE_ON_READ",
}


def _seed(spark, tmp_path, name="t", n=30, **extra):
    t = str(tmp_path / name)
    df = spark.createDataFrame(
        [(i, f"n{i}", i * 10, 1, "a" if i % 2 else "b") for i in range(n)],
        "id long, name string, amount long, ts long, part string",
    )
    _write(df, t, **{**OPTS, **extra})
    return t


def _snap(spark, t):
    from hudi_rs_spark.sources.hudi import HudiTable

    return {
        r.id: (r.name, r.amount)
        for r in HudiTable(t, spark).read()
        .select("id", "name", "amount").collect()
    }


class TestPredicateDml:
    def test_update_where(self, spark, tmp_path):
        from hudi_rs_spark.write import update_where

        t = _seed(spark, tmp_path)
        n = update_where(
            spark, t, {"amount": "amount + 1000", "ts": "2"}, "id < 5"
        )
        assert n == 5
        snap = _snap(spark, t)
        assert snap[0] == ("n0", 1000) and snap[4] == ("n4", 1040)
        assert snap[5] == ("n5", 50)  # unmatched untouched
        assert len(snap) == 30

    def test_update_where_column_expr(self, spark, tmp_path):
        from hudi_rs_spark.write import update_where

        t = _seed(spark, tmp_path)
        n = update_where(
            spark, t,
            {"name": F.concat(F.col("name"), F.lit("!")), "ts": F.lit(2)},
            F.col("id") == 7,
        )
        assert n == 1
        assert _snap(spark, t)[7] == ("n7!", 70)

    def test_delete_where(self, spark, tmp_path):
        from hudi_rs_spark.write import delete_where

        t = _seed(spark, tmp_path)
        n = delete_where(spark, t, "part = 'b' AND id >= 20")
        snap = _snap(spark, t)
        assert n == 5  # ids 20..28 even
        assert len(snap) == 25 and 20 not in snap and 21 in snap

    def test_no_match_publishes_nothing(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable
        from hudi_rs_spark.write import delete_where, update_where

        t = _seed(spark, tmp_path)
        before = len(HudiTable(t, spark).timeline.instants)
        assert update_where(spark, t, {"amount": "0"}, "id = -1") == 0
        assert delete_where(spark, t, "id = -1") == 0
        assert len(HudiTable(t, spark).timeline.instants) == before

    def test_key_and_partition_columns_frozen(self, spark, tmp_path):
        from hudi_rs_spark.write import update_where

        t = _seed(spark, tmp_path)
        with pytest.raises(ValueError, match="key/partition"):
            update_where(spark, t, {"id": "id + 1"}, "id = 1")
        with pytest.raises(ValueError, match="key/partition"):
            update_where(spark, t, {"part": "'c'"}, "id = 1")


class TestBloomBackfill:
    def test_backfill_then_bloom_tier_tagging(self, spark, tmp_path):
        from hudi_rs_spark.config.table_config import HudiTableConfig
        from hudi_rs_spark.metadata.bloom_filters import read_bloom_filters
        from hudi_rs_spark.sources.hudi import HudiTable
        from hudi_rs_spark.write.mdt_bloom import backfill_bloom_filters
        from hudi_rs_spark.write.upsert import upsert

        t = _seed(
            spark, tmp_path,
            **{"metadata.enable": "true", "table.version": "8"},
        )
        nb = backfill_bloom_filters(spark, t)
        assert nb > 0
        blooms = read_bloom_filters(t)
        live = {
            s.base_file.file_name
            for s in HudiTable(t, spark=None, listing="direct").get_file_slices()
        }
        assert set(blooms) == live and len(blooms) == nb
        tc = HudiTableConfig.from_base_path(t)
        assert "bloom_filters" in tc.props["hoodie.table.metadata.partitions"]
        # tagging now routes through the bloom tier and stays correct
        upsert(
            spark.createDataFrame(
                [(3, "UP", 999, 9, "a"), (100, "NEW", 1, 9, "b")],
                "id long, name string, amount long, ts long, part string",
            ),
            t,
        )
        snap = _snap(spark, t)
        assert snap[3] == ("UP", 999) and snap[100] == ("NEW", 1)
        assert len(snap) == 31

    def test_backfill_requires_mdt(self, spark, tmp_path):
        from hudi_rs_spark.write.mdt_bloom import backfill_bloom_filters

        t = _seed(spark, tmp_path)
        with pytest.raises(ValueError, match="metadata"):
            backfill_bloom_filters(spark, t)


class TestDeletePartitions:
    def test_drop_partition_metadata_only(self, spark, tmp_path):
        import glob

        from hudi_rs_spark.sources.hudi import HudiTable
        from hudi_rs_spark.write import delete_partitions

        t = _seed(spark, tmp_path)
        tl = HudiTable(t, spark=None, listing="direct").timeline
        first = tl.instants[0].timestamp
        files_before = set(glob.glob(f"{t}/part=b/*.parquet"))
        assert files_before
        n = delete_partitions(t, ["part=b"])
        assert n >= 1
        snap = HudiTable(t, spark).read()
        parts = {r.part for r in snap.select("part").distinct().collect()}
        assert parts == {"a"}
        assert snap.count() == 15
        # metadata-only: the dropped partition's bytes are untouched
        assert set(glob.glob(f"{t}/part=b/*.parquet")) == files_before
        # time travel before the drop still reads both partitions
        from hudi_rs_spark.config.read_config import HudiReadOptions

        tt = HudiTable(t, spark).read(HudiReadOptions(as_of_timestamp=first))
        assert {r.part for r in tt.select("part").distinct().collect()} == {
            "a", "b",
        }
        # the instant is a replacecommit and re-dropping is a no-op
        tl2 = HudiTable(t, spark=None, listing="direct").timeline
        assert any(
            i.action.value == "replacecommit" for i in tl2.instants
        )
        assert delete_partitions(t, ["part=b"]) == 0

    def test_unknown_partition_is_noop(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable
        from hudi_rs_spark.write import delete_partitions

        t = _seed(spark, tmp_path)
        before = len(HudiTable(t, spark=None, listing="direct").timeline.instants)
        assert delete_partitions(t, ["part=zz"]) == 0
        assert (
            len(HudiTable(t, spark=None, listing="direct").timeline.instants)
            == before
        )

    def test_concurrent_commit_on_dropped_group_conflicts(
        self, spark, tmp_path
    ):
        """An upsert landing on part=b between the drop's listing and its
        publish must fail the drop (lost update otherwise)."""
        import hudi_rs_spark.write.concurrency as conc
        from hudi_rs_spark.write import delete_partitions
        from hudi_rs_spark.write.concurrency import ConcurrentWriteError
        from hudi_rs_spark.write.upsert import upsert

        t = _seed(spark, tmp_path)
        orig_claim = conc.claim_instant

        def claim_then_race(cfg, action=None, **kw):
            out = orig_claim(cfg, action, **kw)
            if cfg.operation == "delete_partition":
                upsert(
                    spark.createDataFrame(
                        [(2, "late", 99, 9, "b")],
                        "id long, name string, amount long, ts long, part string",
                    ),
                    t,
                )
            return out

        conc.claim_instant = claim_then_race
        try:
            with pytest.raises(ConcurrentWriteError, match="conflict"):
                delete_partitions(t, ["part=b"])
        finally:
            conc.claim_instant = orig_claim

    def test_upsert_after_drop_reinserts_fresh_group(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable
        from hudi_rs_spark.write import delete_partitions
        from hudi_rs_spark.write.upsert import upsert

        t = _seed(spark, tmp_path)
        delete_partitions(t, ["part=b"])
        upsert(
            spark.createDataFrame(
                [(100, "fresh", 1, 2, "b")],
                "id long, name string, amount long, ts long, part string",
            ),
            t,
        )
        snap = {
            r.id: r.part for r in HudiTable(t, spark).read().collect()
        }
        assert snap[100] == "b"
        assert 2 not in snap  # old part=b rows stay dropped
