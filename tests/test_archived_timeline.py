"""Archived timeline (op 19 completion): double-gated archived-instant
loading (timeline/mod.rs:98-135), layout-1 archive-folder listing
(loader.rs:236-253), layout-2 LSM manifest + history files
(lsm_tree.rs:91-110), and the archival-boundary rule that keeps data of
archived commits visible to snapshot reads."""

from __future__ import annotations

import os

import pytest

from tests.synth import SynthTable, write_lsm_history

C1 = "20240101000000000"
C2 = "20240201000000000"
C3 = "20240301000000000"

ARCHIVED_ON = {"hoodie.internal.timeline.archived.enabled": "true"}


def _three_commit_table(tmp_path, extra_props=None) -> SynthTable:
    """C1/C2/C3 each write one file group; C1 then gets archived."""
    base = os.path.join(tmp_path, "tbl")
    t = SynthTable(base, extra_props=extra_props)
    for fg, c, key, v in [
        ("g1-0", C1, "a", "v1"),
        ("g2-0", C2, "b", "v2"),
        ("g3-0", C3, "c", "v3"),
    ]:
        t.write_base(fg, c, {"id": [key], "ts": [1], "val": [v]}, [key])
        t.commit(c)
    t.archive_instant(C1)
    return t


class TestArchivalBoundary:
    """Snapshot correctness does NOT depend on the archived-read flag:
    commits older than the earliest active instant are completed by
    definition, so their base files stay visible."""

    def test_snapshot_sees_archived_commit_data(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable

        t = _three_commit_table(tmp_path)  # gate OFF
        rows = {r["id"]: r["val"] for r in HudiTable(t.base_path, spark).read().collect()}
        assert rows == {"a": "v1", "b": "v2", "c": "v3"}

    def test_time_travel_into_archived_range(self, spark, tmp_path):
        from hudi_rs_spark.config.read_config import HudiReadOptions
        from hudi_rs_spark.sources.hudi import HudiTable

        t = _three_commit_table(tmp_path)
        df = HudiTable(t.base_path, spark).read(HudiReadOptions(as_of_timestamp=C1))
        assert {r["id"] for r in df.collect()} == {"a"}


class TestLayout1Archived:
    def test_double_gate(self, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable
        from hudi_rs_spark.timeline.timeline import Timeline
        from hudi_rs_spark.config.table_config import HudiTableConfig

        t = _three_commit_table(tmp_path)
        cfg_off = HudiTableConfig.from_base_path(t.base_path)
        tl_off = Timeline.load(t.base_path, cfg_off)
        # gate off: archived instants never join, even with a time filter
        assert [i.timestamp for i in tl_off.instants_as_of(C3)] == [C2, C3]

        t2 = _three_commit_table(os.path.join(tmp_path, "on"), extra_props=ARCHIVED_ON)
        cfg_on = HudiTableConfig.from_base_path(t2.base_path)
        tl_on = Timeline.load(t2.base_path, cfg_on)
        # no time filter: still active-only (the other half of the gate)
        assert [i.timestamp for i in tl_on.instants_as_of(None)] == [C2, C3]
        # time filter + flag: archived included
        assert [i.timestamp for i in tl_on.instants_as_of(C3)] == [C1, C2, C3]
        assert [i.timestamp for i in tl_on.instants_in_range(None, C1)] == [C1]

    def test_incremental_into_archived_range(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable

        t = _three_commit_table(tmp_path, extra_props=ARCHIVED_ON)
        ht = HudiTable(t.base_path, spark)
        # (<C1, C2] spans the archived commit: its row must be included
        inc = {r["id"] for r in ht.read_incremental("20230101000000000", C2).collect()}
        assert inc == {"a", "b"}

    def test_incremental_gate_off_sees_active_only(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable

        t = _three_commit_table(tmp_path)
        ht = HudiTable(t.base_path, spark)
        inc = {r["id"] for r in ht.read_incremental("20230101000000000", C2).collect()}
        assert inc == {"b"}


class TestLayout2LSM:
    V8_PROPS = {
        "hoodie.table.version": "8",
        "hoodie.timeline.layout.version": "2",
        "hoodie.timeline.path": "timeline",
        "hoodie.timeline.history.path": "history",
        **ARCHIVED_ON,
    }

    def _build(self, tmp_path) -> SynthTable:
        base = os.path.join(tmp_path, "tbl8")
        t = SynthTable(base, extra_props=self.V8_PROPS)
        t.write_base("g1-0", C1, {"id": ["a"], "ts": [1], "val": ["v1"]}, ["a"])
        meta_c1 = t.commit_metadata_bytes(C1)  # captured before archival
        t.write_base("g2-0", C2, {"id": ["b"], "ts": [1], "val": ["v2"]}, ["b"])
        t.commit(C2)
        # C1 lives ONLY in the LSM history (never written to active)
        write_lsm_history(
            os.path.join(base, ".hoodie", "timeline", "history"),
            [(C1, C1, "deltacommit", meta_c1)],
        )
        return t

    def test_lsm_instants_loaded(self, tmp_path):
        from hudi_rs_spark.config.table_config import HudiTableConfig
        from hudi_rs_spark.timeline.timeline import Timeline

        t = self._build(tmp_path)
        tl = Timeline.load(t.base_path, HudiTableConfig.from_base_path(t.base_path))
        assert [i.timestamp for i in tl.archived_instants()] == [C1]
        assert [i.timestamp for i in tl.instants_as_of(C3)] == [C1, C2]
        # metadata decoded from the history record's embedded bytes
        meta = tl.metadata_for(tl.archived_instants()[0])
        assert [ws.file_id for ws in meta.write_stats] == ["g1-0"]

    def test_incremental_into_lsm_range(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable

        t = self._build(tmp_path)
        ht = HudiTable(t.base_path, spark)
        inc = {r["id"] for r in ht.read_incremental("20230101000000000", C2).collect()}
        assert inc == {"a", "b"}
