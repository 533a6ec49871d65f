"""Regression tests for the round-4 advisor findings: archived-timeline
authority (a partial or trimmed archive load must never hide committed
data), truncated-media-container decode resilience, and short-output
detection in Hadoop-framed block decompression."""

from __future__ import annotations

import os
import struct

import pytest

from tests.synth import SynthTable

C1 = "20240101000000000"
C2 = "20240201000000000"
C3 = "20240301000000000"
CRASHED = "20240115000000000"  # between C1 and C2

ARCHIVED_ON = {"hoodie.internal.timeline.archived.enabled": "true"}


class TestArchivedAuthority:
    """fs_view advisory (medium): non-membership in the archived timeline
    condemns a sub-boundary slice ONLY when the load was complete (no
    unparseable files skipped) AND ts >= min(archived) — a trimmed archive
    loses its oldest instants first."""

    def _table(self, tmp_path) -> SynthTable:
        base = os.path.join(tmp_path, "tbl")
        t = SynthTable(base, extra_props=ARCHIVED_ON)
        for fg, c, key, v in [
            ("g1-0", C1, "a", "v1"),
            ("g2-0", C2, "b", "v2"),
            ("g3-0", C3, "c", "v3"),
        ]:
            t.write_base(fg, c, {"id": [key], "ts": [1], "val": [v]}, [key])
            t.commit(c)
        t.archive_instant(C1)
        t.archive_instant(C2)
        return t

    def _archive_dir(self, t: SynthTable) -> str:
        return os.path.join(t.base_path, ".hoodie", "archived")

    def test_orphan_below_min_with_clean_complete_load_is_hidden(
        self, spark, tmp_path
    ):
        """The fail-closed rule still bites where it is safe: complete
        archive load, orphan ts inside the covered range [min(archived),
        boundary), no pending marker -> not committed, data hidden."""
        from hudi_rs_spark.sources.hudi import HudiTable

        t = self._table(tmp_path)
        t.write_base("g9-0", CRASHED, {"id": ["x"], "ts": [1], "val": ["BAD"]}, ["x"])
        rows = {r["id"]: r["val"] for r in HudiTable(t.base_path, spark).read().collect()}
        assert rows == {"a": "v1", "b": "v2", "c": "v3"}

    def test_unparseable_archive_file_keeps_fail_open(self, spark, tmp_path):
        """Real v6 archives are compacted `.commits_.archive.N` files the
        layout-1 lister cannot name-parse. Their presence means the loaded
        instant set is INCOMPLETE: an orphan base below the boundary must
        stay visible (it may be committed inside the undecoded segment)."""
        from hudi_rs_spark.sources.hudi import HudiTable

        t = self._table(tmp_path)
        with open(
            os.path.join(self._archive_dir(t), ".commits_.archive.1"), "wb"
        ) as f:
            f.write(b"Obj\x01avro-segment-we-do-not-decode")
        t.write_base("g9-0", CRASHED, {"id": ["x"], "ts": [1], "val": ["OK"]}, ["x"])
        rows = {r["id"]: r["val"] for r in HudiTable(t.base_path, spark).read().collect()}
        assert rows == {"a": "v1", "b": "v2", "c": "v3", "x": "OK"}

    def test_trimmed_archive_below_min_keeps_fail_open(self, spark, tmp_path):
        """An externally trimmed archive loses its OLDEST instants first.
        A base whose ts < min(archived) cannot be judged by absence: the
        load parsed cleanly yet its record provably does not reach back
        that far."""
        from hudi_rs_spark.sources.hudi import HudiTable

        t = self._table(tmp_path)
        # trim C1 out of the archive entirely (a whole-file delete parses
        # cleanly — nothing is "skipped")
        os.remove(os.path.join(self._archive_dir(t), f"{C1}.deltacommit"))
        rows = {r["id"]: r["val"] for r in HudiTable(t.base_path, spark).read().collect()}
        # C1's data survives even though C1 is absent from the archive
        assert rows == {"a": "v1", "b": "v2", "c": "v3"}

    def test_archived_load_complete_flags(self, tmp_path):
        from hudi_rs_spark.config.table_config import HudiTableConfig
        from hudi_rs_spark.timeline.timeline import Timeline

        t = self._table(tmp_path)
        tl = Timeline.load(t.base_path, HudiTableConfig.from_base_path(t.base_path))
        assert tl.archived_load_complete() is True
        assert tl.archived_completed_timestamps() == {C1, C2}

        with open(
            os.path.join(self._archive_dir(t), ".commits_.archive.1"), "wb"
        ) as f:
            f.write(b"x")
        tl2 = Timeline.load(t.base_path, HudiTableConfig.from_base_path(t.base_path))
        assert tl2.archived_load_complete() is False
        # parsed instants still load — positive membership keeps working
        assert tl2.archived_completed_timestamps() == {C1, C2}

    def test_gate_off_reports_incomplete(self, tmp_path):
        from hudi_rs_spark.config.table_config import HudiTableConfig
        from hudi_rs_spark.timeline.timeline import Timeline

        base = os.path.join(tmp_path, "off")
        t = SynthTable(base)
        t.write_base("g1-0", C1, {"id": ["a"], "ts": [1], "val": ["v1"]}, ["a"])
        t.commit(C1)
        tl = Timeline.load(t.base_path, HudiTableConfig.from_base_path(t.base_path))
        assert tl.archived_load_complete() is False


class TestTruncatedContainers:
    """multimodal advisory (low): payloads that pass the magic sniff but
    are truncated mid-header must fall through to the stub path, never
    fail the executor task."""

    TRUNC_PPMV = b"PPMV" + struct.pack(">I", 5)  # count but no frame_ms
    TRUNC_PPM = b"P6\n2 2\n255\n\x00\x00\x00"  # 3 of 12 pixel bytes
    TRUNC_BMP = b"BM" + b"\x00" * 6  # no offset/header words
    TRUNC_WAV = (
        b"RIFF" + struct.pack("<I", 20) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + b"\x00\x00"  # fmt chunk cut short
    )

    def test_default_decode_falls_back_to_stub(self):
        from hudi_rs_spark.operators.multimodal import _stub_decode, default_decode

        for payload in (self.TRUNC_PPMV, self.TRUNC_PPM, self.TRUNC_BMP):
            assert default_decode(payload) == _stub_decode(payload)

    def test_frame_sample_survives_truncated_ppmv(self, spark):
        from hudi_rs_spark.operators.multimodal import frame_sample

        df = spark.createDataFrame(
            [(1, bytearray(self.TRUNC_PPMV))], "item_id long, data binary"
        )
        rows = frame_sample(df, "item_id", "data").collect()
        # stub path: 1-4 deterministic frames, task did not fail
        assert 1 <= len(rows) <= 4
        assert all(r["item_id"] == 1 for r in rows)

    def test_resize_passes_through_truncated_image(self, spark):
        from hudi_rs_spark.operators.multimodal import resize_images

        df = spark.createDataFrame(
            [(1, bytearray(self.TRUNC_PPM)), (2, bytearray(self.TRUNC_BMP))],
            "item_id long, data binary",
        )
        rows = {r["item_id"]: r for r in resize_images(df, "item_id", "data").collect()}
        assert rows[1]["resized"] is False and bytes(rows[1]["data"]) == self.TRUNC_PPM
        assert rows[2]["resized"] is False and bytes(rows[2]["data"]) == self.TRUNC_BMP

    def test_audio_features_null_on_truncated_wav(self, spark):
        from hudi_rs_spark.operators.multimodal import audio_features

        df = spark.createDataFrame(
            [(1, bytearray(self.TRUNC_WAV))], "item_id long, data binary"
        )
        (row,) = audio_features(df, "item_id", "data").collect()
        assert row["sample_rate"] is None and row["rms"] is None
        assert row["n_bytes"] == len(self.TRUNC_WAV)


class TestHadoopFramedShortOutput:
    """compression advisory (low): a stream that ends before producing
    uncompressed_size bytes must raise at the decompression site."""

    def test_truncated_at_chunk_boundary_raises(self):
        from hudi_rs_spark.hfile.compression import (
            _hadoop_framed,
            snappy_decompress_block,
        )

        # one complete chunk of 4 bytes, but caller expected 8: the loop
        # exits on pos >= n with a silently-short result pre-fix
        piece = b"\x04\x0cabcd"  # varint len=4, literal tag for 4 bytes
        raw = struct.pack(">i", 4) + struct.pack(">i", len(piece)) + piece
        assert _hadoop_framed(raw, 4, snappy_decompress_block) == b"abcd"
        with pytest.raises(ValueError, match="short output"):
            _hadoop_framed(raw, 8, snappy_decompress_block)

    def test_empty_stream_nonzero_expectation_raises(self):
        from hudi_rs_spark.hfile.compression import (
            _hadoop_framed,
            snappy_decompress_block,
        )

        with pytest.raises(ValueError, match="short output"):
            _hadoop_framed(b"", 1, snappy_decompress_block)
