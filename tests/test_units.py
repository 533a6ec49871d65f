"""Unit tests for driver-side planner pieces (no Spark needed)."""

from __future__ import annotations

from decimal import Decimal

import pytest

from hudi_rs_spark.avro.binary import decode_datum
from hudi_rs_spark.config.table_config import parse_properties
from hudi_rs_spark.fs.file_group import BaseFile, FileGroup, LogFile
from hudi_rs_spark.plans.partition_pruner import Filter, PartitionPruner
from hudi_rs_spark.timeline.instant import Action, Instant, State, parse_hudi_timestamp_millis


class TestProperties:
    def test_escaped_colons(self):
        props = parse_properties('a.b={"x"\\:1}\nhoodie.table.name=t1\n#comment\n')
        assert props["a.b"] == '{"x":1}'
        assert props["hoodie.table.name"] == "t1"


class TestInstant:
    def test_v6_completed(self):
        i = Instant.from_file_name("20240418172802262.commit")
        assert i.timestamp == "20240418172802262"
        assert i.action == Action.COMMIT
        assert i.state == State.COMPLETED
        assert i.completion_timestamp is None

    def test_v8_completed_with_completion_ts(self):
        i = Instant.from_file_name("20251220210108078_20251220210109593.deltacommit")
        assert i.timestamp == "20251220210108078"
        assert i.completion_timestamp == "20251220210109593"
        assert i.action == Action.DELTA_COMMIT

    def test_commit_inflight_has_no_action(self):
        i = Instant.from_file_name("20240418172802262.inflight")
        assert (i.action, i.state) == (Action.COMMIT, State.INFLIGHT)

    def test_replacecommit(self):
        i = Instant.from_file_name("20240418173235694.replacecommit.requested")
        assert (i.action, i.state) == (Action.REPLACE_COMMIT, State.REQUESTED)

    def test_non_data_action_rejected(self):
        with pytest.raises((ValueError, KeyError)):
            Instant.from_file_name("20251220210117766.indexing")

    def test_epoch_millis_fallback(self):
        # metadata-table style zero-padded epoch millis
        assert parse_hudi_timestamp_millis("00000000000000000") == 0

    def test_timestamp_parse(self):
        assert parse_hudi_timestamp_millis("20240101000000") == 1704067200000
        assert parse_hudi_timestamp_millis("20240101000000123") == 1704067200123


class TestFileNames:
    def test_base_file(self):
        bf = BaseFile.parse(
            "6e1d5cc4-c487-487d-abbe-fe9b30b1c0cc-0_0-1112-3190_20251220210129235.parquet"
        )
        assert bf.file_id == "6e1d5cc4-c487-487d-abbe-fe9b30b1c0cc-0"
        assert bf.write_token == "0-1112-3190"
        assert bf.commit_timestamp == "20251220210129235"
        assert bf.extension == "parquet"

    def test_log_file(self):
        lf = LogFile.parse(
            ".6e1d5cc4-c487-487d-abbe-fe9b30b1c0cc-0_20251220210127080.log.1_0-1072-3078"
        )
        assert lf.file_id == "6e1d5cc4-c487-487d-abbe-fe9b30b1c0cc-0"
        assert lf.timestamp == "20251220210127080"
        assert lf.version == 1
        assert lf.write_token == "0-1072-3078"

    def test_bad_names_rejected(self):
        with pytest.raises(ValueError):
            BaseFile.parse("not_a_base_file.txt")
        with pytest.raises(ValueError):
            LogFile.parse("nodot_file.log.1_0")


class TestFileGroupAsOf:
    def _group(self):
        g = FileGroup("fid-0", "p")
        for ts in ("20240101000000000", "20240201000000000", "20240301000000000"):
            g.add_base_file(BaseFile("fid-0", "0-1-1", ts, "parquet", f"fid-0_0-1-1_{ts}.parquet"))
        return g

    def test_latest(self):
        assert self._group().get_file_slice_as_of(None).commit_timestamp == "20240301000000000"

    def test_as_of_mid(self):
        assert (
            self._group().get_file_slice_as_of("20240215000000000").commit_timestamp
            == "20240201000000000"
        )

    def test_as_of_exact(self):
        assert (
            self._group().get_file_slice_as_of("20240201000000000").commit_timestamp
            == "20240201000000000"
        )

    def test_before_all(self):
        assert self._group().get_file_slice_as_of("20230101000000000") is None

    def test_log_association_by_completion_time(self):
        g = self._group()
        lf = LogFile("fid-0", "20240210000000000", "log", 1, "0-1-1", ".x.log.1_0", 0,
                     completion_timestamp="20240215000000000")
        g.add_log_file(lf)
        assert g.slices["20240201000000000"].log_files == [lf]


class TestPartitionPruner:
    def test_hive_style_typed(self):
        p = PartitionPruner(
            [("byteField", "int"), ("shortField", "int")],
            [Filter("byteField", ">=", "10"), Filter("byteField", "<", "30")],
            hive_style=True,
            url_encoded=False,
        )
        assert p.should_include("byteField=10/shortField=300")
        assert not p.should_include("byteField=30/shortField=100")

    def test_non_hive(self):
        p = PartitionPruner(
            [("part", "int")], [Filter("part", "=", "10")], hive_style=False, url_encoded=False
        )
        assert p.should_include("10")
        assert not p.should_include("20")

    def test_fail_open_on_parse_error(self):
        p = PartitionPruner(
            [("part", "int")], [Filter("part", "=", "10")], hive_style=False, url_encoded=False
        )
        assert p.should_include("not_a_number/extra")

    def test_in_filter_with_escaped_comma(self):
        f = Filter("city", "IN", "a\\,b,c")
        assert f.values() == ["a,b", "c"]


class TestAvroBinary:
    def test_decode_record(self):
        # {"a": long 3, "b": string "hi"} with nullable union on b
        schema = {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "a", "type": "long"},
                {"name": "b", "type": ["null", "string"]},
            ],
        }
        # a=3 -> zigzag 6; b union idx 1 -> 2; len 2 -> 4; "hi"
        buf = bytes([0x06, 0x02, 0x04]) + b"hi"
        assert decode_datum(buf, schema) == {"a": 3, "b": "hi"}

    def test_decimal_logical(self):
        schema = {"type": "bytes", "logicalType": "decimal", "precision": 10, "scale": 2}
        # unscaled 12345 -> bytes big-endian 0x3039, avro bytes len 2 -> varint 4
        buf = bytes([0x04, 0x30, 0x39])
        assert decode_datum(buf, schema) == Decimal("123.45")


class TestConformTypeEvolution:
    """conform_value mirrors the base-scan epoch cast for log records of
    type-evolved columns (old-typed values into the resolved type)."""

    def test_numeric_into_string_column(self):
        from pyspark.sql import types as T

        from hudi_rs_spark.sources.conform import conform_value

        assert conform_value(1700000000001, T.StringType()) == "1700000000001"
        assert conform_value(1.5, T.StringType()) == "1.5"
        assert conform_value(True, T.StringType()) == "true"
        assert conform_value("already", T.StringType()) == "already"
        assert conform_value(None, T.StringType()) is None


class TestSplitIntoChunks:
    """Reference util/collection.rs:56-90 test cases."""

    def test_zero_splits_clamps_to_one(self):
        from hudi_rs_spark.util import split_into_chunks

        assert split_into_chunks([1, 2, 3], 0) == [[1, 2, 3]]

    def test_empty_input(self):
        from hudi_rs_spark.util import split_into_chunks

        assert split_into_chunks([], 2) == []

    def test_more_splits_than_items(self):
        from hudi_rs_spark.util import split_into_chunks

        assert split_into_chunks([1, 2], 5) == [[1], [2]]

    def test_normal_case(self):
        from hudi_rs_spark.util import split_into_chunks

        assert split_into_chunks([1, 2, 3, 4, 5], 2) == [[1, 2, 3], [4, 5]]
