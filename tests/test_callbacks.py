"""Write-commit callbacks (write/callbacks.py): post-publish
notifications from the single commit choke point — registered Python
callables + the JSON-line file sink; failures never fail the commit."""

from __future__ import annotations

import json
import os

import pytest

from hudi_rs_spark.write.callbacks import (
    last_callback_errors,
    register_commit_callback,
    unregister_commit_callback,
)
from hudi_rs_spark.write.upsert import upsert


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from hudi_rs_spark.sources.pyds import HudiPyDataSource

    spark.dataSource.register(HudiPyDataSource)


def _seed(spark, path, cb_file=None):
    df = spark.createDataFrame(
        [(i, f"n{i}", ["a", "b"][i % 2], 1) for i in range(8)],
        "id int, name string, city string, ts int",
    )
    w = (
        df.write.format("hudi_py").option("path", path)
        .option("recordkey.field", "id")
        .option("precombine.field", "ts")
        .option("partitionpath.field", "city")
        .option("table.type", "MERGE_ON_READ")
        .option("table.version", "8")
    )
    if cb_file:
        w = w.option("commit.callback.file", cb_file)
    w.mode("append").save()


class TestFileSink:
    def test_events_for_writes_and_services(self, spark, tmp_path):
        from hudi_rs_spark.write.compact import compact

        path, cb = str(tmp_path / "t"), str(tmp_path / "events.jsonl")
        _seed(spark, path, cb_file=cb)
        upsert(
            spark.createDataFrame(
                [(1, "u1", "b", 2)], "id int, name string, city string, ts int"
            ),
            path,
        )
        compact(spark, path)
        events = [json.loads(x) for x in open(cb).read().splitlines()]
        actions = [e["action"] for e in events]
        assert actions.count("deltacommit") >= 2  # seed + upsert
        assert "commit" in actions  # the compaction
        seedev = events[0]
        assert seedev["rows"] == 8
        assert set(seedev["partitions"]) == {"city=a", "city=b"}
        assert seedev["table"] == path

    def test_property_persists_for_later_appends(self, spark, tmp_path):
        # callback set at CREATION fires for appends with no option
        path, cb = str(tmp_path / "t"), str(tmp_path / "events.jsonl")
        _seed(spark, path, cb_file=cb)
        n_before = len(open(cb).read().splitlines())
        upsert(
            spark.createDataFrame(
                [(2, "u2", "a", 2)], "id int, name string, city string, ts int"
            ),
            path,
        )
        assert len(open(cb).read().splitlines()) == n_before + 1

    def test_unwritable_sink_never_fails_commit(self, spark, tmp_path):
        from hudi_rs_spark.write.compact import compact

        path = str(tmp_path / "t")
        bad = str(tmp_path / "no_such_dir" / "events.jsonl")
        _seed(spark, path, cb_file=bad)  # must not raise
        upsert(
            spark.createDataFrame(
                [(1, "u1", "b", 2)], "id int, name string, city string, ts int"
            ),
            path,
        )
        last_callback_errors()  # drain
        # a driver-side service commit records the swallowed error
        assert compact(spark, path) > 0
        errs = last_callback_errors()
        assert any("file callback" in e for e in errs)
        got = (
            spark.read.format("hudi_py").option("path", path).load().count()
        )
        assert got == 8  # every commit landed fine


class TestRegisteredCallables:
    def test_callable_fires_and_errors_are_contained(self, spark, tmp_path):
        # callables observe DRIVER-process publishes (services/DML) —
        # the df.write path publishes in the DataSource worker, which
        # the file sink covers (TestFileSink)
        from hudi_rs_spark.write.compact import compact

        path = str(tmp_path / "t")
        _seed(spark, path)
        upsert(
            spark.createDataFrame(
                [(1, "u1", "b", 2)], "id int, name string, city string, ts int"
            ),
            path,
        )
        seen = []

        def ok(event):
            seen.append(event["action"])

        def boom(event):
            raise RuntimeError("downstream hiccup")

        register_commit_callback(ok)
        register_commit_callback(boom)
        try:
            last_callback_errors()
            assert compact(spark, path) > 0
        finally:
            assert unregister_commit_callback(ok)
            assert unregister_commit_callback(boom)
        assert seen == ["commit"]
        assert any("downstream hiccup" in e for e in last_callback_errors())
