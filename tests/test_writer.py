"""Round-trip the EXPERIMENTAL writer API (hudi_rs_spark.write): write a
MOR table with the package's own writer, read it back with the engine,
verify merge/time-travel semantics — at both supported table versions
(v6 / timeline layout 1 and v8 / layout 2 completion-time naming)."""

from __future__ import annotations

import os

import pytest

from hudi_rs_spark.sources.hudi import HudiTable
from hudi_rs_spark.write import (
    HudiTableWriter,
    avro_schema,
    delete_block,
    parquet_data_block,
    rollback_block,
)

C1 = "20240101000000000"
C2 = "20240102000000000"
C3 = "20240103000000000"

SCHEMA = avro_schema([("id", "string"), ("ts", "long"), ("val", "string")])


def _vals(df) -> dict:
    return {r["id"]: r["val"] for r in df.collect() if r["id"] is not None}


def _write_table(base: str, version: int) -> HudiTableWriter:
    t = HudiTableWriter(base, table_version=version)
    t.write_base(
        "g1-0", C1, {"id": ["k1", "k2"], "ts": [1, 1], "val": ["a", "b"]},
        ["k1", "k2"],
    )
    t.commit(C1, schema=SCHEMA)
    rows = t.log_rows(C2, {"id": ["k1"], "ts": [2], "val": ["a2"]}, ["k1"], "log")
    t.append_log("g1-0", C1, parquet_data_block(C2, rows), stats_instant=C2)
    t.commit(C2, schema=SCHEMA, completion=C3)
    return t


class TestWriterRoundTrip:
    @pytest.mark.parametrize("version", [6, 8])
    def test_write_read_merge(self, spark, tmp_path, version):
        base = os.path.join(str(tmp_path), f"v{version}")
        _write_table(base, version)
        table = HudiTable(base, spark)
        assert table.config.timeline_layout_version == (1 if version == 6 else 2)
        assert _vals(table.read()) == {"k1": "a2", "k2": "b"}

    @pytest.mark.parametrize("version", [6, 8])
    def test_time_travel(self, spark, tmp_path, version):
        from hudi_rs_spark.config.read_config import HudiReadOptions

        base = os.path.join(str(tmp_path), f"tt{version}")
        _write_table(base, version)
        got = _vals(
            HudiTable(base, spark).read(HudiReadOptions(as_of_timestamp=C1))
        )
        assert got == {"k1": "a", "k2": "b"}

    def test_v8_timeline_location(self, tmp_path):
        base = os.path.join(str(tmp_path), "loc")
        t = _write_table(base, 8)
        assert t.timeline_dir.endswith(".hoodie/timeline")
        names = sorted(os.listdir(t.timeline_dir))
        # layout 2: completed commit files carry a completion timestamp
        assert f"{C1}_{C1}.deltacommit" in names
        assert f"{C2}_{C3}.deltacommit" in names

    def test_rollback_roundtrip(self, spark, tmp_path):
        base = os.path.join(str(tmp_path), "rb")
        t = _write_table(base, 6)
        t.append_log("g1-0", C1, rollback_block(C3, C2), version=2)
        t.commit(C3, schema=SCHEMA)
        assert _vals(HudiTable(base, spark).read()) == {"k1": "a", "k2": "b"}

    def test_delete_block_roundtrip(self, spark, tmp_path):
        """Writer-produced delete blocks (new r7: the writer can now emit
        every data-bearing block type the reader decodes) must remove the
        key when their ordering value beats every row version."""
        from hudi_rs_spark.logfile import reader as logreader

        base = os.path.join(str(tmp_path), "del")
        t = _write_table(base, 6)
        t.append_log(
            "g1-0", C1, delete_block(C3, [("k1", "", 9)]),
            version=2, stats_instant=C3,
        )
        t.commit(C3, schema=SCHEMA)
        # decoder-level: the triple survives the avro round-trip exactly
        log_path = os.path.join(base, ".g1-0_20240101000000000.log.2_0-1-0")
        (b,) = logreader.read_log_file(log_path)
        assert b.delete_records == [("k1", "", 9)]
        # engine-level: k1 (ordering 2 < 9) is deleted, k2 survives
        assert _vals(HudiTable(base, spark).read()) == {"k2": "b"}

    def test_delete_block_low_ordering_loses(self, spark, tmp_path):
        base = os.path.join(str(tmp_path), "del-lose")
        t = _write_table(base, 6)
        # ordering 1 < the row's ts=2 update: delete must NOT win
        t.append_log(
            "g1-0", C1, delete_block(C3, [("k1", "", 1)]),
            version=2, stats_instant=C3,
        )
        t.commit(C3, schema=SCHEMA)
        assert _vals(HudiTable(base, spark).read()) == {"k1": "a2", "k2": "b"}
