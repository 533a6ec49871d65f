"""Timestamp uniqueness across actions (write/concurrency.py
claim_unique_timestamp): claim markers embed the action, so create_new
alone only serializes same-action writers. A deltacommit and a
replacecommit landing in the same millisecond would both claim
timestamp T, publish two instants sharing it, and slip past OCC (which
identifies "self" by timestamp). These tests pin the collision paths
deterministically by pinning/monkeypatching the instant source — the
flake the background suite caught before the fix.
"""

from __future__ import annotations

import pyarrow as pa
import pytest
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("ts", T.LongType()),
    ]
)

T0 = "20240101000000000"


def _writer(path, overwrite=False, **extra):
    from hudi_rs_spark.write.writer import HudiPyBatchWriter

    opts = {
        "path": path,
        "recordkey.field": "id",
        "precombine.field": "ts",
        "table.type": "MERGE_ON_READ",
        **extra,
    }
    return HudiPyBatchWriter(opts, SCHEMA, overwrite=overwrite)


def _seed(path):
    from hudi_rs_spark.write.writer import HudiWriteMessage, _TaskWriter

    w = _writer(path)
    tw = _TaskWriter(w.cfg, 0, "0-0-0")
    tw.consume(
        pa.record_batch(
            {
                "id": pa.array([1, 2], pa.int64()),
                "name": pa.array(["a", "b"], pa.string()),
                "ts": pa.array([1, 1], pa.int64()),
            }
        )
    )
    w.commit([HudiWriteMessage(stats=tw.finish())])


class TestCrossActionClaim:
    def test_pinned_cross_action_same_instant_fails_loudly(self, tmp_path):
        from hudi_rs_spark.write.concurrency import ConcurrentWriteError

        p = str(tmp_path / "t")
        _seed(p)
        _writer(p, overwrite=True, instant=T0)  # claims T0.replacecommit
        with pytest.raises(ConcurrentWriteError, match="already in use"):
            _writer(p, overwrite=False, instant=T0)  # T0.deltacommit

    def test_unpinned_collision_regenerates_instant(self, tmp_path, monkeypatch):
        import hudi_rs_spark.write.config as config_mod

        p = str(tmp_path / "t")
        _seed(p)
        t2 = "20240101000000777"
        seq = iter([T0, T0, T0, t2, t2])
        monkeypatch.setattr(config_mod, "new_instant", lambda: next(seq))
        a = _writer(p, overwrite=True)  # takes T0
        b = _writer(p, overwrite=False)  # collides on T0, regenerates
        assert a.cfg.instant == T0
        assert b.cfg.instant == t2

    def test_schedule_compaction_avoids_claimed_timestamp(
        self, spark, tmp_path, monkeypatch
    ):
        """A scheduled compaction plan racing a same-ms data writer must
        end up on its own timestamp (the plan marker doubles as the
        instant claim)."""
        import hudi_rs_spark.write.config as config_mod
        from hudi_rs_spark.write.async_compact import schedule_compaction
        from hudi_rs_spark.write.upsert import upsert

        p = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(i, f"n{i}", 1) for i in range(8)], "id long, name string, ts long"
        )
        (
            df.write.format("hudi_py").option("path", p)
            .option("recordkey.field", "id").option("precombine.field", "ts")
            .option("table.type", "MERGE_ON_READ").option("table.version", "8")
            .mode("append").save()
        )
        upsert(
            spark.createDataFrame([(1, "x", 2)], "id long, name string, ts long"),
            p,
        )
        # a live writer holds T_claim; the plan must dodge it
        t_claim = "20990101000000000"
        t_free = "20990101000000001"
        from hudi_rs_spark.write.concurrency import claim_instant
        from hudi_rs_spark.write.config import WriteConfig

        cfg = WriteConfig(path=p, table_version=8, instant=t_claim,
                          table_type="MERGE_ON_READ")
        claim_instant(cfg, "deltacommit")
        import hudi_rs_spark.write.async_compact as ac_mod

        seq = iter([t_claim, t_claim, t_free, t_free])
        monkeypatch.setattr(config_mod, "new_instant", lambda: next(seq))
        monkeypatch.setattr(ac_mod, "new_instant", lambda: next(seq))
        inst = schedule_compaction(p)
        assert inst == t_free

    @pytest.fixture(scope="module", autouse=True)
    def _register(self, spark):
        from hudi_rs_spark.sources.pyds import HudiPyDataSource

        spark.dataSource.register(HudiPyDataSource)


class TestStreamInstantCollision:
    def test_batch_instant_dodges_published_timestamp(self, tmp_path, monkeypatch):
        import hudi_rs_spark.write.stream as stream_mod
        from hudi_rs_spark.write.config import WriteConfig
        from hudi_rs_spark.write.stream import batch_instant
        from hudi_rs_spark.write.writer import commit_instant, init_table

        base = str(tmp_path / "t")
        cfg = WriteConfig(path=base, table_name="t", instant=T0)
        init_table(cfg)
        commit_instant(cfg, [], None)  # T0.commit on the timeline
        t2 = "20240101000000333"
        seq = iter([T0, T0, t2, t2])
        monkeypatch.setattr(stream_mod, "new_instant", lambda: next(seq))
        assert batch_instant(base, 0, "q1") == t2

    def test_replayed_batch_reuses_sidecar_instant(self, tmp_path):
        from hudi_rs_spark.write.config import WriteConfig
        from hudi_rs_spark.write.stream import batch_instant
        from hudi_rs_spark.write.writer import init_table

        base = str(tmp_path / "t")
        init_table(WriteConfig(path=base, table_name="t"))
        first = batch_instant(base, 5, "qx")
        assert batch_instant(base, 5, "qx") == first
