"""CDC log blocks (type 6) decode as record data like the reference
(scanner.rs:182,223) — a CDC-enabled MOR table reads without error."""

from __future__ import annotations

import json
import os

from hudi_rs_spark.logfile import reader as logreader
from hudi_rs_spark.logfile.reader import BLOCK_CDC_DATA
from tests.synth import (
    SynthTable,
    avro_data_block,
    cdc_block,
    parquet_data_block,
)

C1 = "20240101000000000"
C2 = "20240102000000000"


def test_cdc_block_decodes_as_records(tmp_path):
    p = os.path.join(tmp_path, "f.log")
    changes = [
        {
            "op": "u",
            "ts_ms": "1704153600000",
            "before": json.dumps({"id": "k1", "val": "old"}),
            "after": json.dumps({"id": "k1", "val": "new"}),
        }
    ]
    with open(p, "wb") as f:
        f.write(cdc_block(C2, changes))
    blocks = logreader.read_log_file(p)
    assert len(blocks) == 1
    b = blocks[0]
    assert b.block_type == BLOCK_CDC_DATA
    assert b.instant_time == C2
    assert b.records == changes
    # CDC blocks pass validity gating like any data block
    assert logreader.valid_blocks(blocks, valid_instants={C2}) == blocks


def test_avro_encoder_roundtrip(tmp_path):
    from tests.synth import avro_schema

    schema = avro_schema([("id", "string"), ("n", "long")])
    p = os.path.join(tmp_path, "f.log")
    with open(p, "wb") as f:
        f.write(avro_data_block(C1, schema, [{"id": "a", "n": 7}, {"id": None, "n": -3}]))
    (b,) = logreader.read_log_file(p)
    assert b.records == [{"id": "a", "n": 7}, {"id": None, "n": -3}]
    assert b.schema_json == schema


def test_cdc_bearing_table_reads_without_error(spark, tmp_path):
    from hudi_rs_spark.sources.hudi import HudiTable

    base = os.path.join(tmp_path, "tbl")
    t = SynthTable(base)
    t.write_base("g1-0", C1, {"id": ["k1"], "ts": [1], "val": ["old"]}, ["k1"])
    t.commit(C1)
    rows = t.log_rows(C2, {"id": ["k1"], "ts": [2], "val": ["new"]}, ["k1"], "log")
    payload = parquet_data_block(C2, rows) + cdc_block(
        C2,
        [{"op": "u", "ts_ms": "0", "before": None, "after": json.dumps({"id": "k1"})}],
    )
    t.append_log("g1-0", C1, payload, stats_instant=C2)
    t.commit(C2)

    out = HudiTable(base, spark).read().collect()  # must not raise
    vals = {r["id"]: r["val"] for r in out if r["id"] is not None}
    assert vals == {"k1": "new"}


class TestChangeFeed:
    """HudiTable.read_changes: typed CDC feed from type-6 blocks,
    commit-window bounded and rollback-gated."""

    def _table(self, tmp_path) -> SynthTable:
        base = os.path.join(tmp_path, "cdc_tbl")
        t = SynthTable(base)
        t.write_base("g1-0", C1, {"id": ["k1"], "ts": [1], "val": ["v1"]}, ["k1"])
        t.append_log(
            "g1-0",
            C1,
            cdc_block(
                C2,
                [
                    {
                        "op": "u",
                        "ts_ms": "1704153600000",
                        "before": json.dumps({"id": "k1", "val": "v1"}),
                        "after": json.dumps({"id": "k1", "val": "v2"}),
                    }
                ],
            ),
            stats_instant=C2,
        )
        t.commit(C1)
        t.commit(C2)
        return t

    def test_changes_in_window(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable

        t = self._table(tmp_path)
        feed = HudiTable(t.base_path, spark).read_changes(C1, C2).collect()
        assert len(feed) == 1
        r = feed[0]
        assert r["op"] == "u" and r["commit_time"] == C2
        assert json.loads(r["after"]) == {"id": "k1", "val": "v2"}

    def test_window_excludes_outside_commits(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable

        t = self._table(tmp_path)
        assert HudiTable(t.base_path, spark).read_changes(C2).collect() == []
        assert HudiTable(t.base_path, spark).read_changes(None, C1).collect() == []

    def test_rolled_back_changes_never_leak(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable
        from tests.synth import rollback_block

        t = self._table(tmp_path)
        C3 = "20240103000000000"
        # a rollback command voiding C2's blocks lands in a later file
        t.append_log("g1-0", C1, rollback_block(C3, C2), version=2)
        t.commit(C3)
        assert HudiTable(t.base_path, spark).read_changes(C1).collect() == []

    def test_plain_table_yields_empty_feed(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable

        base = os.path.join(tmp_path, "plain")
        t = SynthTable(base)
        t.write_base("g1-0", C1, {"id": ["a"], "ts": [1], "val": ["x"]}, ["a"])
        t.commit(C1)
        df = HudiTable(t.base_path, spark).read_changes(None)
        assert df.collect() == [] and "op" in df.columns


class TestConnectorCdc:
    def test_query_type_cdc_matches_read_changes(self, spark, tmp_path):
        """format('hudi_py') with queryType=cdc: the same typed change
        feed as HudiTable.read_changes, decoded on executors."""
        from hudi_rs_spark.sources.hudi import HudiTable
        from hudi_rs_spark.sources.pyds import HudiPyDataSource

        spark.dataSource.register(HudiPyDataSource)
        t = TestChangeFeed()._table(tmp_path)
        conn = (
            spark.read.format("hudi_py")
            .option("path", t.base_path)
            .option("queryType", "cdc")
            .option("startTimestamp", C1)
            .load()
        )
        cols = sorted(conn.columns)
        got = sorted(map(tuple, conn.select(*cols).collect()))
        eager = HudiTable(t.base_path, spark).read_changes(C1)
        want = sorted(map(tuple, eager.select(*cols).collect()))
        assert got == want and len(got) == 1


class TestDerivedChangeFeed:
    """read_changes_derived: before/after images diffed from consecutive
    commit snapshots — the fallback for tables whose writer records no
    CDC blocks. On a CDC-bearing table the derived feed must agree with
    the decoded CDC blocks (images compared as parsed JSON: the block
    writer controls key order, the differ doesn't)."""

    C3 = "20240103000000000"

    def _table(self, tmp_path):
        t = SynthTable(os.path.join(tmp_path, "tbl"))
        t.write_base(
            "g1-0", C1,
            {"id": ["k1", "k2"], "ts": [1, 1], "val": ["a", "b"]},
            ["k1", "k2"],
        )
        t.commit(C1)
        rows = t.log_rows(C2, {"id": ["k1"], "ts": [2], "val": ["a2"]}, ["k1"], "log")
        payload = parquet_data_block(C2, rows) + cdc_block(
            C2,
            [{
                "op": "u",
                "ts_ms": "1704153600000",
                "before": json.dumps({"id": "k1", "ts": 1, "val": "a"}),
                "after": json.dumps({"id": "k1", "ts": 2, "val": "a2"}),
            }],
        )
        t.append_log("g1-0", C1, payload, stats_instant=C2)
        t.commit(C2)
        return t

    @staticmethod
    def _norm(df):
        rows = [
            (
                r["commit_time"],
                r["op"],
                json.loads(r["before"]) if r["before"] else None,
                json.loads(r["after"]) if r["after"] else None,
            )
            for r in df.collect()
        ]
        return sorted(rows, key=lambda x: json.dumps(x, sort_keys=True))

    def test_derived_matches_cdc_blocks(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable

        t = self._table(str(tmp_path))
        table = HudiTable(t.base_path, spark)
        blocks = self._norm(table.read_changes(C1, C2))
        derived = self._norm(table.read_changes_derived(C1, C2))
        assert derived == blocks
        assert len(derived) == 1 and derived[0][1] == "u"

    def test_derived_covers_inserts_without_cdc_blocks(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable

        t = self._table(str(tmp_path))
        # C3: a brand-new file group, NO cdc block written
        t.write_base("g2-0", self.C3, {"id": ["k3"], "ts": [1], "val": ["c"]},
                     ["k3"])
        t.commit(self.C3)
        table = HudiTable(t.base_path, spark)
        assert self._norm(table.read_changes(C2, self.C3)) == []  # blocks: blind
        derived = self._norm(table.read_changes_derived(C2, self.C3))
        assert derived == [
            (self.C3, "i", None, {"id": "k3", "ts": 1, "val": "c"})
        ]

    def test_first_commit_window_is_all_inserts(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable

        t = self._table(str(tmp_path))
        derived = self._norm(HudiTable(t.base_path, spark)
                             .read_changes_derived(None, C1))
        assert [(c, o, a["id"]) for c, o, _b, a in derived] == [
            (C1, "i", "k1"), (C1, "i", "k2")]
