"""Writer-side CDC emission (`cdc.enabled`): typed type-6 change blocks
land next to the data blocks, the change feed reads back through
HudiTable.read_changes / the connector's cdc query, and snapshots stay
byte-identical (the data merge skips CDC blocks)."""

from __future__ import annotations

import json

import pytest


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from hudi_rs_spark.sources.pyds import HudiPyDataSource

    spark.dataSource.register(HudiPyDataSource)


def _write(df, path, **options):
    w = df.write.format("hudi_py").option("path", path)
    for k, v in options.items():
        w = w.option(k, v)
    w.mode("append").save()


def _people(spark, n=10, start=0, ts=1):
    return spark.createDataFrame(
        [(start + i, f"n{start + i}", ts) for i in range(n)],
        "id long, name string, ts long",
    )


OPTS = {
    "recordkey.field": "id", "precombine.field": "ts",
    "table.type": "MERGE_ON_READ", "cdc.enabled": "true",
}


class TestCdcWriter:
    def _lifecycle(self, spark, tdir):
        from hudi_rs_spark.write.upsert import delete, upsert

        _write(_people(spark, 10), tdir, **OPTS)
        upsert(
            spark.createDataFrame(
                [(3, "u3", 5)], "id long, name string, ts long"
            ),
            tdir,
        )
        delete(
            spark.createDataFrame(
                [(7, None, 6)], "id long, name string, ts long"
            ),
            tdir,
        )

    def test_feed_captures_i_u_d(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable

        tdir = str(tmp_path / "t")
        self._lifecycle(spark, tdir)
        rows = HudiTable(tdir, spark).read_changes(None).collect()
        by_op = {}
        for r in rows:
            by_op.setdefault(r.op, []).append(r)
        assert len(by_op["i"]) == 10
        assert len(by_op["u"]) == 1
        assert len(by_op["d"]) == 1
        u = json.loads(by_op["u"][0].after)
        assert u["id"] == 3 and u["name"] == "u3"
        d = json.loads(by_op["d"][0].before)
        assert d["_hoodie_record_key"] == "7"
        # after-images carry every data column, no meta/internal columns
        i0 = json.loads(by_op["i"][0].after)
        assert set(i0) == {"id", "name", "ts"}

    def test_window_bounds_the_feed(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable

        tdir = str(tmp_path / "t")
        self._lifecycle(spark, tdir)
        t = HudiTable(tdir, spark)
        inst = [i.timestamp for i in t.timeline.instants]
        assert len(inst) == 3
        # window (first, second]: only the update
        win = t.read_changes(inst[0], inst[1]).collect()
        assert [r.op for r in win] == ["u"]

    def test_snapshot_unaffected_and_appends_keep_emitting(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable

        tdir = str(tmp_path / "t")
        self._lifecycle(spark, tdir)
        # plain append WITHOUT the option: the table property keeps CDC on
        _write(_people(spark, 2, start=100, ts=9), tdir, **{
            "recordkey.field": "id", "precombine.field": "ts",
            "table.type": "MERGE_ON_READ",
        })
        t = HudiTable(tdir, spark)
        rows = {r.id: r.name for r in t.read().collect()}
        assert rows[3] == "u3" and 7 not in rows and rows[100] == "n100"
        feed = t.read_changes(None).collect()
        assert sum(1 for r in feed if r.op == "i") == 12  # 10 + 2 appended

    def test_connector_cdc_query_matches_eager(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable

        tdir = str(tmp_path / "t")
        self._lifecycle(spark, tdir)
        def key(r):
            return tuple("" if v is None else str(v) for v in r)

        eager = sorted(
            map(key, HudiTable(tdir, spark).read_changes(None).collect())
        )
        conn = (
            spark.read.format("hudi_py").option("path", tdir)
            .option("queryType", "cdc")
            .load()
        )
        assert sorted(map(key, conn.collect())) == eager

    def test_no_cdc_without_flag(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable

        tdir = str(tmp_path / "t")
        _write(_people(spark, 5), tdir, **{
            "recordkey.field": "id", "precombine.field": "ts",
            "table.type": "MERGE_ON_READ",
        })
        assert HudiTable(tdir, spark).read_changes(None).count() == 0
