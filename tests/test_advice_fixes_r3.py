"""Regression tests for the round-2 advisor findings: archival-bypass
gating on live pending markers, secondary-index '$' escaping, point
lookups on tables without populated meta fields, and cross-chunk sorting
in the stateful sessionizer."""

from __future__ import annotations

import os

import pytest

from tests.synth import SynthTable

C1 = "20240101000000000"
C2 = "20240103000000000"


class TestArchivalBypassPendingGate:
    """fs_view advisory: a crashed write whose ts predates the archival
    boundary (archival archived completed instants AROUND it) must stay
    invisible while its requested/inflight marker survives — 'older than
    the boundary' alone is not proof of completion."""

    CRASHED = "20240102000000000"

    def _table(self, tmp_path) -> SynthTable:
        base = os.path.join(tmp_path, "tbl")
        t = SynthTable(base)
        t.write_base("g1-0", C1, {"id": ["a"], "ts": [1], "val": ["v1"]}, ["a"])
        t.commit(C1)
        t.write_base("g2-0", C2, {"id": ["b"], "ts": [1], "val": ["v2"]}, ["b"])
        t.commit(C2)
        t.archive_instant(C1)  # boundary becomes C2 > CRASHED
        # crashed write: base file present, only an inflight marker on the
        # timeline (lazy rollback has not cleaned it yet)
        t.write_base(
            "g3-0", self.CRASHED, {"id": ["x"], "ts": [1], "val": ["BAD"]}, ["x"]
        )
        return t

    def test_pending_marker_blocks_bypass(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable

        t = self._table(tmp_path)
        marker = os.path.join(t.timeline_dir, f"{self.CRASHED}.deltacommit.inflight")
        with open(marker, "wb"):
            pass
        rows = {r["id"]: r["val"] for r in HudiTable(t.base_path, spark).read().collect()}
        # archived C1 stays visible; the crashed write's data does not leak
        assert rows == {"a": "v1", "b": "v2"}

    def test_no_marker_keeps_archived_visible(self, spark, tmp_path):
        """Without a surviving marker the sub-boundary commit is
        indistinguishable from a cleanly archived one — the bypass holds
        (rolled-back writes are cleaned before archival)."""
        from hudi_rs_spark.sources.hudi import HudiTable

        t = self._table(tmp_path)
        rows = {r["id"]: r["val"] for r in HudiTable(t.base_path, spark).read().collect()}
        assert rows == {"a": "v1", "b": "v2", "x": "BAD"}

    def test_timeline_collects_pending(self, tmp_path):
        from hudi_rs_spark.config.table_config import HudiTableConfig
        from hudi_rs_spark.timeline.timeline import Timeline

        t = self._table(tmp_path)
        with open(
            os.path.join(t.timeline_dir, f"{self.CRASHED}.deltacommit.inflight"), "wb"
        ):
            pass
        # a completed instant with a stale leftover marker is NOT pending
        with open(os.path.join(t.timeline_dir, f"{C2}.deltacommit.requested"), "wb"):
            pass
        tl = Timeline.load(t.base_path, HudiTableConfig.from_base_path(t.base_path))
        assert tl.pending_timestamps == {self.CRASHED}

    def test_log_blocks_of_pending_commit_stay_invisible(self, tmp_path):
        from hudi_rs_spark.logfile import reader as logreader
        from tests.test_advice_fixes import data_block

        p = os.path.join(tmp_path, "x.log")
        with open(p, "wb") as f:
            f.write(data_block(C1, ["a"]))
        blocks = logreader.read_log_file(p)
        # sub-boundary + no marker info -> bypass applies
        assert (
            len(
                logreader.valid_blocks(
                    blocks, valid_instants={C2}, archival_boundary=C2
                )
            )
            == 1
        )
        # sub-boundary but a live pending marker -> invisible
        assert (
            logreader.valid_blocks(
                blocks,
                valid_instants={C2},
                archival_boundary=C2,
                pending_instants={C1},
            )
            == []
        )


class TestSecondaryIndexKeyEscaping:
    def test_plain_split(self):
        from hudi_rs_spark.metadata.secondary_index import split_secondary_index_key

        assert split_secondary_index_key("rider-A$key1") == ("rider-A", "key1")

    def test_escaped_dollar_in_value(self):
        from hudi_rs_spark.metadata.secondary_index import split_secondary_index_key

        assert split_secondary_index_key(r"pri\$ce$key1") == ("pri$ce", "key1")

    def test_escaped_dollar_in_record_key(self):
        from hudi_rs_spark.metadata.secondary_index import split_secondary_index_key

        # rpartition('$') would have split INSIDE the record key here
        assert split_secondary_index_key(r"val$id\$7") == ("val", "id$7")

    def test_escaped_backslash(self):
        from hudi_rs_spark.metadata.secondary_index import split_secondary_index_key

        assert split_secondary_index_key(r"a\\$b") == ("a\\", "b")

    def test_no_separator_is_malformed(self):
        from hudi_rs_spark.metadata.secondary_index import split_secondary_index_key

        assert split_secondary_index_key(r"no\$separator") is None


class TestPointLookupWithoutMetaFields:
    def _table(self, tmp_path, record_key="id") -> SynthTable:
        base = os.path.join(tmp_path, "nometa")
        t = SynthTable(
            base,
            record_key=record_key,
            extra_props={
                "hoodie.populate.meta.fields": "false",
                "hoodie.table.metadata.partitions": "files,record_index",
            },
        )
        return t

    def test_key_predicate_from_record_key_field(self, spark, tmp_path, monkeypatch):
        """With meta fields off, the predicate must come from the
        configured record-key column, not _hoodie_record_key."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from hudi_rs_spark.config.read_config import HudiReadOptions
        from hudi_rs_spark.sources.hudi import HudiTable

        t = self._table(tmp_path)
        # meta-field-free base file
        name = f"g1-0_0-1-0_{C1}.parquet"
        pq.write_table(
            pa.table({"id": ["a", "b", "c"], "ts": [1, 1, 1], "val": ["1", "2", "3"]}),
            os.path.join(t.base_path, name),
        )
        t._write_stats.setdefault(C1, []).append(
            {"fileId": "g1-0", "path": name, "partitionPath": ""}
        )
        t.commit(C1)

        import hudi_rs_spark.metadata.record_index as ri

        monkeypatch.setattr(ri, "read_record_index", lambda *a, **k: {"b": ("", "g1-0")})
        tbl = HudiTable(t.base_path, spark)
        got = tbl.point_lookup(["b"]).collect()
        assert [r["val"] for r in got] == ["2"]

    def test_composite_key_raises_descriptive(self, spark, tmp_path, monkeypatch):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from hudi_rs_spark.sources.hudi import HudiTable

        t = self._table(tmp_path, record_key="id,ts")
        name = f"g1-0_0-1-0_{C1}.parquet"
        pq.write_table(
            pa.table({"id": ["a"], "ts": [1], "val": ["1"]}),
            os.path.join(t.base_path, name),
        )
        t._write_stats.setdefault(C1, []).append(
            {"fileId": "g1-0", "path": name, "partitionPath": ""}
        )
        t.commit(C1)
        import hudi_rs_spark.metadata.record_index as ri

        monkeypatch.setattr(ri, "read_record_index", lambda *a, **k: {"a:1": ("", "g1-0")})
        with pytest.raises(ValueError, match="recordkey"):
            HudiTable(t.base_path, spark).point_lookup(["a:1"]).collect()


class TestStatefulCrossChunkSort:
    def test_fold_sorts_across_chunks(self):
        """Events for one user split across two pandas chunks, the LATER
        chunk holding the EARLIER timestamps: per-chunk sorting would
        close a phantom session; a global sort must not."""
        import pandas as pd

        from hudi_rs_spark.streaming.stateful import sessionize_stateful

        # drive the inner fold directly through a stub GroupState
        class StubState:
            exists = False
            payload = None

            def update(self, v):
                self.payload = v

            @property
            def get(self):
                raise AssertionError("unused")

        # reconstruct the closure the operator builds
        captured = {}

        class FakeGrouped:
            def applyInPandasWithState(self, fn, *a, **k):
                captured["fn"] = fn
                return None

        class FakeDF:
            def select(self, *c):
                return self

            def groupBy(self, *c):
                return FakeGrouped()

        sessionize_stateful(FakeDF(), gap_seconds=10)
        fold = captured["fn"]

        def chunk(ts_seconds):
            return pd.DataFrame(
                {
                    "ts": pd.to_datetime(ts_seconds, unit="s"),
                    "value": [1.0] * len(ts_seconds),
                }
            )

        state = StubState()
        # chunk 1: t=100; chunk 2: t=50 (out of order across chunks, both
        # within one 10s... gap is 10s: 50 and 100 are 50s apart -> the
        # sorted fold closes ONE session (50) and leaves 100 open; the
        # unsorted chunk-by-chunk fold would instead see 100 then 50 and
        # treat 50 as a stale out-of-order event closing the 100-session.
        out = list(fold((7,), iter([chunk([100]), chunk([50])]), state))
        closed = out[0] if out else None
        assert closed is not None and len(closed) == 1
        assert closed.iloc[0]["session_start_us"] == 50 * 1_000_000
        assert closed.iloc[0]["session_end_us"] == 50 * 1_000_000
        # open session = the later event
        assert state.payload[0] == 100 * 1_000_000
        assert state.payload[1] == 100 * 1_000_000
        assert state.payload[2] == 1
