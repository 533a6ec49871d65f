"""Incremental materialized-view maintenance (operators/incremental_view):
refresh-by-CDC-deltas must equal full recompute over the final snapshot,
including group-crossing updates, deletes, multi-update keys, and
window-inserted new keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hudi_rs_spark.operators.incremental_view import (
    agg_state,
    incremental_agg_refresh,
)
from hudi_rs_spark.write.upsert import delete, upsert

GROUPS = {"cat": "string"}
SUMS = {"v": "bigint"}


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from hudi_rs_spark.sources.pyds import HudiPyDataSource

    spark.dataSource.register(HudiPyDataSource)


def _rows(spark, data):
    return spark.createDataFrame(
        data, "id int, cat string, v bigint, ts int"
    )


def _seed(spark, path):
    df = _rows(
        spark, [(i, ["x", "y"][i % 2], 10 * (i + 1), 1) for i in range(10)]
    )
    (
        df.write.format("hudi_py").option("path", path)
        .option("recordkey.field", "id")
        .option("precombine.field", "ts")
        .option("table.type", "MERGE_ON_READ")
        .option("table.version", "8")
        .option("cdc.enabled", "true")
        .mode("append").save()
    )


def _commits(path):
    from hudi_rs_spark.sources.hudi import HudiTable

    t = HudiTable(path, spark=None, listing="direct")
    return sorted(
        i.timestamp for i in t.timeline.instants if i.is_completed
    )


def _snapshot_state(spark, path):
    snap = spark.read.format("hudi_py").option("path", path).load()
    return agg_state(
        snap.select(F.col("cat"), F.col("v").cast("bigint")),
        ["cat"], ["v"],
    )


def _as_rows(df):
    return sorted(
        (r["cat"], r["n_rows"], r["sum_v"]) for r in df.collect()
    )


class TestIncrementalAggRefresh:
    def test_equals_full_recompute(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        seed_instant = _commits(path)[-1]
        state = _snapshot_state(spark, path).localCheckpoint(eager=True)

        # window: group-crossing update (id 0: x -> y), plain update
        # (id 2 value change), NEW key insert (id 100), delete (id 4),
        # and a key updated TWICE (id 6 — last change must win)
        upsert(
            _rows(spark, [(0, "y", 11, 2), (2, "x", 999, 2), (6, "x", 1, 2)]),
            path,
        )
        upsert(_rows(spark, [(100, "z", 5, 3), (6, "x", 2, 3)]), path)
        delete(_rows(spark, [(4, "x", 50, 4)]), path)

        refreshed = incremental_agg_refresh(
            spark, path, state, GROUPS, SUMS, "id", "int", seed_instant
        )
        assert _as_rows(refreshed) == _as_rows(_snapshot_state(spark, path))

    def test_group_emptied_by_deletes_dropped(self, spark, tmp_path):
        path = str(tmp_path / "t")
        df = _rows(spark, [(1, "solo", 7, 1), (2, "big", 3, 1)])
        (
            df.write.format("hudi_py").option("path", path)
            .option("recordkey.field", "id")
            .option("precombine.field", "ts")
            .option("table.type", "MERGE_ON_READ")
            .option("table.version", "8")
            .option("cdc.enabled", "true")
            .mode("append").save()
        )
        seed_instant = _commits(path)[-1]
        state = _snapshot_state(spark, path).localCheckpoint(eager=True)
        delete(_rows(spark, [(1, "solo", 7, 2)]), path)
        refreshed = incremental_agg_refresh(
            spark, path, state, GROUPS, SUMS, "id", "int", seed_instant
        )
        rows = _as_rows(refreshed)
        assert rows == [("big", 1, 3)]  # 'solo' dropped at n_rows == 0

    def test_bounded_window(self, spark, tmp_path):
        # refresh to a MID timeline instant: equals recompute as of it
        path = str(tmp_path / "t")
        _seed(spark, path)
        seed_instant = _commits(path)[-1]
        state = _snapshot_state(spark, path).localCheckpoint(eager=True)
        upsert(_rows(spark, [(0, "y", 11, 2)]), path)
        mid = _commits(path)[-1]
        upsert(_rows(spark, [(1, "x", 1000, 3)]), path)

        from hudi_rs_spark.config.read_config import HudiReadOptions
        from hudi_rs_spark.sources.hudi import HudiTable

        refreshed = incremental_agg_refresh(
            spark, path, state, GROUPS, SUMS, "id", "int",
            seed_instant, to_instant=mid,
        )
        mid_snap = HudiTable(path, spark).read(
            HudiReadOptions(as_of_timestamp=mid)
        )
        want = agg_state(
            mid_snap.select("cat", F.col("v").cast("bigint")),
            ["cat"], ["v"],
        )
        assert _as_rows(refreshed) == _as_rows(want)


class TestStreamingRefresh:
    def test_foreachbatch_maintains_view(self, spark, tmp_path):
        """Streaming composition: the CDC readStream source signals each
        commit window; foreachBatch applies the SAME delta refresh per
        micro-batch — the continuously-maintained state must equal the
        final full recompute."""
        import time

        path = str(tmp_path / "t")
        _seed(spark, path)
        seed_instant = _commits(path)[-1]
        upsert(_rows(spark, [(0, "y", 11, 2), (100, "z", 5, 2)]), path)
        delete(_rows(spark, [(4, "x", 50, 3)]), path)

        holder = {
            "df": _snapshot_state_asof(spark, path, seed_instant)
            .localCheckpoint(eager=True),
            "last": seed_instant,
        }

        def handle(batch, _bid):
            rows = batch.select(F.max("commit_time").alias("hi")).collect()
            hi = rows[0]["hi"]
            if hi is None or hi <= holder["last"]:
                return
            holder["df"] = incremental_agg_refresh(
                spark, path, holder["df"], GROUPS, SUMS, "id", "int",
                from_instant=holder["last"], to_instant=hi,
            ).localCheckpoint(eager=True)
            holder["last"] = hi

        q = (
            spark.readStream.format("hudi_py").option("path", path)
            .option("queryType", "cdc")
            .option("startTimestamp", seed_instant)
            .load()
            .writeStream.foreachBatch(handle)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        deadline = time.time() + 240
        while q.isActive and time.time() < deadline:
            time.sleep(2)
        assert not q.isActive and q.exception() is None
        assert _as_rows(holder["df"]) == _as_rows(_snapshot_state(spark, path))


def _snapshot_state_asof(spark, path, instant):
    from hudi_rs_spark.config.read_config import HudiReadOptions
    from hudi_rs_spark.sources.hudi import HudiTable

    snap = HudiTable(path, spark).read(
        HudiReadOptions(as_of_timestamp=instant)
    )
    return agg_state(
        snap.select(F.col("cat"), F.col("v").cast("bigint")), ["cat"], ["v"]
    )


class TestMinMaxMaintenance:
    def test_delete_retires_extremum(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)  # cat x: v in {10,30,50,70,90}; y: {20,...,100}
        seed_instant = _commits(path)[-1]
        snap0 = spark.read.format("hudi_py").option("path", path).load()
        state = agg_state(
            snap0.select("cat", F.col("v").cast("bigint")),
            ["cat"], ["v"], minmax_cols=["v"],
        ).localCheckpoint(eager=True)

        # delete cat-x's max (id 8 -> v 90) and update its min upward
        delete(_rows(spark, [(8, "y", 90, 2)]), path)
        upsert(_rows(spark, [(0, "x", 45, 3)]), path)

        refreshed = incremental_agg_refresh(
            spark, path, state, GROUPS, SUMS, "id", "int", seed_instant,
            minmax_cols={"v": "bigint"},
        )
        snap = spark.read.format("hudi_py").option("path", path).load()
        want = agg_state(
            snap.select("cat", F.col("v").cast("bigint")),
            ["cat"], ["v"], minmax_cols=["v"],
        )
        got = sorted(tuple(r) for r in refreshed.collect())
        exp = sorted(tuple(r) for r in want.collect())
        assert got == exp
        # pin that the delete ACTUALLY retired an extremum: id 8 was
        # cat x's v=90 (deletes route by KEY, the frame's cat is
        # ignored), so x's max falls to 70; id 0's re-value 10 -> 45
        # moves x's min to 30; y is untouched
        pre = {r["cat"]: (r["min_v"], r["max_v"]) for r in state.collect()}
        post = {r[0]: (r[3], r[4]) for r in got}
        assert pre["x"] == (10, 90) and post["x"] == (30, 70)
        assert pre["y"] == post["y"] == (20, 100)

    def test_untouched_group_keeps_stored_extremes(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        seed_instant = _commits(path)[-1]
        snap0 = spark.read.format("hudi_py").option("path", path).load()
        state = agg_state(
            snap0.select("cat", F.col("v").cast("bigint")),
            ["cat"], ["v"], minmax_cols=["v"],
        ).localCheckpoint(eager=True)
        # only touch cat y (ids odd); x must come through bit-identical
        delete(_rows(spark, [(9, "y", 100, 2)]), path)
        refreshed = {
            r["cat"]: (r["n_rows"], r["sum_v"], r["min_v"], r["max_v"])
            for r in incremental_agg_refresh(
                spark, path, state, GROUPS, SUMS, "id", "int",
                seed_instant, minmax_cols={"v": "bigint"},
            ).collect()
        }
        assert refreshed["x"] == (5, 10 + 30 + 50 + 70 + 90, 10, 90)
        assert refreshed["y"] == (4, 20 + 40 + 60 + 80, 20, 80)


class TestKeyPushdownPaths:
    def test_join_fallback_matches_fast_path(self, spark, tmp_path, monkeypatch):
        import hudi_rs_spark.operators.incremental_view as iv

        path = str(tmp_path / "t")
        _seed(spark, path)
        seed_instant = _commits(path)[-1]
        state = _snapshot_state(spark, path).localCheckpoint(eager=True)
        upsert(_rows(spark, [(0, "y", 11, 2), (3, "x", 7, 2)]), path)
        delete(_rows(spark, [(4, "x", 50, 3)]), path)

        fast = _as_rows(
            incremental_agg_refresh(
                spark, path, state, GROUPS, SUMS, "id", "int", seed_instant
            )
        )
        monkeypatch.setattr(iv, "_MAX_KEY_PUSHDOWN", 1)  # force the join
        slow = _as_rows(
            incremental_agg_refresh(
                spark, path, state, GROUPS, SUMS, "id", "int", seed_instant
            )
        )
        assert fast == slow == _as_rows(_snapshot_state(spark, path))

# Driver fast lane (r14, VERDICT r13 item 1): slow-lane suite — infra/
# feature matrix whose surfaces the oracle write rows exercise end-to-end;
# the builder runs the full lane each round via `pytest -m "slow or not slow"`.
pytestmark = pytest.mark.slow
