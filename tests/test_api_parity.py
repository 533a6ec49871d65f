"""Reference Python API surface parity (python/hudi/_internal.pyi):
timeline action-filtered accessors, HudiTable convenience properties,
HudiFileGroupReader, build_hudi_table, and pruning-attached file-slice
statistics."""

from __future__ import annotations

import os

import pytest

from hudi_rs_spark.sources.hudi import (
    HudiFileGroupReader,
    HudiTable,
    build_hudi_table,
)
from hudi_rs_spark.write import HudiTableWriter, avro_schema, parquet_data_block

C1 = "20240101000000000"
C2 = "20240102000000000"
C3 = "20240103000000000"

SCHEMA = avro_schema([("id", "string"), ("ts", "long"), ("val", "string")])


def _mixed_actions_table(tmp_path) -> HudiTableWriter:
    """deltacommit C1, deltacommit C2 (log), replacecommit C3 with
    operationType=cluster rewriting g1-0 into g2-0."""
    t = HudiTableWriter(os.path.join(str(tmp_path), "acts"))
    t.write_base("g1-0", C1, {"id": ["k1"], "ts": [1], "val": ["a"]}, ["k1"])
    t.commit(C1, schema=SCHEMA)
    rows = t.log_rows(C2, {"id": ["k1"], "ts": [2], "val": ["a2"]}, ["k1"], "log")
    t.append_log("g1-0", C1, parquet_data_block(C2, rows), stats_instant=C2)
    t.commit(C2, schema=SCHEMA)
    t.write_base("g2-0", C3, {"id": ["k1"], "ts": [2], "val": ["a2"]}, ["k1"])
    with open(os.path.join(t.timeline_dir, f"{C3}.replacecommit"), "wb") as f:
        f.write(
            t.commit_metadata_bytes(
                C3, schema=SCHEMA, replaced={"": ["g1-0"]}, operation="cluster"
            )
        )
    return t


class TestTimelineAccessors:
    def test_action_filtered(self, spark, tmp_path):
        t = HudiTable(_mixed_actions_table(tmp_path).base_path, spark)
        tl = t.get_timeline()
        assert [i.timestamp for i in tl.get_completed_deltacommits()] == [C1, C2]
        assert [i.timestamp for i in tl.get_completed_deltacommits(desc=True)] == [
            C2, C1,
        ]
        assert [i.timestamp for i in tl.get_completed_replacecommits()] == [C3]
        assert tl.get_completed_commits() == []  # no plain commits

    def test_clustering_commits_filter_on_operation(self, spark, tmp_path):
        t = HudiTable(_mixed_actions_table(tmp_path).base_path, spark)
        assert [
            i.timestamp
            for i in t.get_timeline().get_completed_clustering_commits()
        ] == [C3]

    def test_instant_metadata_json(self, spark, tmp_path):
        import json

        t = HudiTable(_mixed_actions_table(tmp_path).base_path, spark)
        tl = t.get_timeline()
        (rc,) = tl.get_completed_replacecommits()
        doc = json.loads(tl.get_instant_metadata_in_json(rc))
        assert doc["operationType"] == "cluster"
        assert doc["partitionToReplaceFileIds"] == {"": ["g1-0"]}


class TestTableProperties:
    def test_properties(self, spark, tmp_path):
        base = _mixed_actions_table(tmp_path).base_path
        t = HudiTable(base, spark)
        assert t.base_url == base
        assert t.table_name == "synth"
        assert t.table_type == "MERGE_ON_READ"
        assert t.is_mor is True
        assert t.timezone == "UTC"
        assert t.hudi_options()["hoodie.table.recordkey.fields"] == "id"

    def test_is_metadata_table_enabled(self, spark, tmp_path, v8_trips_table):
        # v6 synth table: always false (reference drops MDT below v8)
        t = HudiTable(_mixed_actions_table(tmp_path).base_path, spark)
        assert t.is_metadata_table_enabled() is False
        # v8 trips fixture configures the files partition
        t8 = HudiTable(v8_trips_table, spark)
        assert t8.is_metadata_table_enabled() is True
        # the nested metadata table itself must report False
        mdt = os.path.join(v8_trips_table, ".hoodie", "metadata")
        if os.path.isdir(mdt):
            assert HudiTable(mdt, spark).is_metadata_table_enabled() is False

    def test_avro_schema_strings(self, spark, tmp_path):
        import json

        t = HudiTable(_mixed_actions_table(tmp_path).base_path, spark)
        plain = json.loads(t.get_schema_in_avro_str())
        assert [f["name"] for f in plain["fields"]] == ["id", "ts", "val"]
        meta = json.loads(t.get_schema_in_avro_str_with_meta_fields())
        assert [f["name"] for f in meta["fields"]][:5] == [
            "_hoodie_commit_time",
            "_hoodie_commit_seqno",
            "_hoodie_record_key",
            "_hoodie_partition_path",
            "_hoodie_file_name",
        ]
        assert [f["name"] for f in meta["fields"]][5:] == ["id", "ts", "val"]


class TestFileGroupReader:
    def test_reader_matches_table_reads(self, spark, tmp_path):
        t = HudiTable(_mixed_actions_table(tmp_path).base_path, spark)
        reader = t.create_file_group_reader_with_options()
        for sl in t.get_file_slices():
            want = sorted(map(tuple, t.read_file_slice(sl).collect()))
            got = sorted(map(tuple, reader.read_file_slice(sl).collect()))
            assert got == want

    def test_reader_from_uri_and_stream(self, spark, tmp_path):
        import pyarrow as pa

        base = _mixed_actions_table(tmp_path).base_path
        reader = HudiFileGroupReader(base)
        reader.table._spark = spark
        [sl] = reader.table.get_file_slices()
        tbl = pa.Table.from_batches(
            list(reader.read_file_slice_stream(sl, batch_size=1))
        )
        assert tbl.num_rows == 1

    def test_is_metadata_table(self, spark, tmp_path, v8_trips_table):
        base = _mixed_actions_table(tmp_path).base_path
        assert HudiFileGroupReader(base).is_metadata_table is False
        mdt = os.path.join(v8_trips_table, ".hoodie", "metadata")
        if os.path.isdir(mdt):
            assert HudiFileGroupReader(mdt).is_metadata_table is True


class TestBuildHudiTable:
    def test_overrides_apply_before_timeline_load(self, spark, tmp_path):
        """hoodie.* overrides that steer timeline discovery must be
        visible to it (review fix r7): point a v6 table at a custom
        timeline dir via overrides; without early application the table
        would silently plan against the default (empty) location."""
        import shutil

        t = _mixed_actions_table(tmp_path)
        hoodie = os.path.join(t.base_path, ".hoodie")
        custom = os.path.join(hoodie, "custom_tl")
        os.makedirs(custom)
        for name in list(os.listdir(hoodie)):
            if "." in name and not name.startswith("hoodie"):
                shutil.move(os.path.join(hoodie, name), custom)
        # without the override: no instants found
        assert HudiTable(t.base_path, spark).timeline.instants == []
        moved = build_hudi_table(
            t.base_path,
            hudi_options={
                "hoodie.timeline.layout.version": "2",
                "hoodie.timeline.path": "custom_tl",
            },
            spark=spark,
        )
        assert [i.timestamp for i in moved.timeline.instants] == [C1, C2, C3]

    def test_mixed_option_split(self, spark, tmp_path):
        base = _mixed_actions_table(tmp_path).base_path
        t = build_hudi_table(
            base,
            options={
                "hoodie.custom.flag": "yes",
                "endpoint_override": "http://127.0.0.1:9",
            },
            spark=spark,
        )
        assert t.config.props["hoodie.custom.flag"] == "yes"
        assert "endpoint_override" not in t.config.props
        # explicit dicts win over mixed options
        t2 = build_hudi_table(
            base,
            hudi_options={"hoodie.custom.flag": "no"},
            options={"hoodie.custom.flag": "yes"},
            spark=spark,
        )
        assert t2.config.props["hoodie.custom.flag"] == "no"


class TestSliceStatsAttachment:
    def test_pruning_attaches_stats(self, spark, tmp_path):
        from hudi_rs_spark.config.read_config import HudiReadOptions
        from hudi_rs_spark.plans.partition_pruner import Filter

        t = HudiTableWriter(
            os.path.join(str(tmp_path), "cow"), table_type="COPY_ON_WRITE"
        )
        t.write_base("g1-0", C1, {"id": ["a"], "ts": [1], "val": ["x"]}, ["a"])
        t.write_base("g2-0", C1, {"id": ["z"], "ts": [9], "val": ["y"]}, ["z"])
        t.commit(C1, action="commit", schema=SCHEMA)
        table = HudiTable(t.base_path, spark)
        slices = table.get_file_slices()
        assert all(s.column_stats is None for s in slices)
        kept = table._stats_prune(
            slices, [Filter("ts", ">", "5")], HudiReadOptions()
        )
        # g1-0 (ts max 1) pruned; survivor carries the loaded footer stats
        assert [s.file_id for s in kept] == ["g2-0"]
        (s,) = kept
        assert s.num_records == 1
        assert s.column_stats["ts"] == (9, 9)
        assert s.column_stats["val"] == ("y", "y")


class TestHudiOptionsBag:
    """reader-spec §2: the hudi_options bag is the per-read override
    layer; builders and bag resolve to the same read."""

    def test_bag_overlays_typed_fields(self):
        from hudi_rs_spark.config.read_config import HudiReadOptions

        o = HudiReadOptions().with_hudi_options(
            {
                "hoodie.read.query.type": "incremental",
                "hoodie.read.start.timestamp": C1,
                "hoodie.read.end.timestamp": C2,
                "hoodie.read.as.of.timestamp": C3,  # stripped: incremental
                "hoodie.read.stream.batch_size": "7",
                "hoodie.read.use.read_optimized.mode": "true",
            }
        )
        r = o.resolve()
        assert r.query_type == "incremental"
        assert r.start_timestamp == C1 and r.end_timestamp == C2
        assert r.as_of_timestamp is None
        assert r.batch_size == 7
        assert r.use_read_optimized_mode is True
        # original untouched (copies)
        assert o.query_type == "snapshot" and o.batch_size == 1024

    def test_snapshot_strips_incremental_timestamps(self):
        from hudi_rs_spark.config.read_config import HudiReadOptions

        r = (
            HudiReadOptions(start_timestamp=C1, end_timestamp=C2)
            .with_as_of_timestamp(C3)
            .resolve()
        )
        assert r.start_timestamp is None and r.end_timestamp is None
        assert r.as_of_timestamp == C3

    def test_bag_read_equals_typed_read(self, spark, tmp_path):
        from hudi_rs_spark.config.read_config import HudiReadOptions

        t = HudiTable(_mixed_actions_table(tmp_path).base_path, spark)
        typed = t.read(HudiReadOptions(use_read_optimized_mode=True))
        bagged = t.read(
            HudiReadOptions().with_hudi_option(
                "hoodie.read.use.read_optimized.mode", "true"
            )
        )
        assert sorted(map(tuple, bagged.collect())) == sorted(
            map(tuple, typed.collect())
        )


class TestInValueEscaping:
    def test_escaped_commas_and_backslashes(self):
        from hudi_rs_spark.plans.partition_pruner import Filter

        f = Filter("name", "IN", r"Smith\, John,Jane")
        assert f.values() == ["Smith, John", "Jane"]
        f2 = Filter("name", "IN", "a\\\\,b")
        assert f2.values() == ["a\\", "b"]


class TestTableBuilder:
    """Reference HudiTableBuilder (python/hudi/table/builder.py):
    fluent hudi/storage/mixed option accumulation, enum or string keys."""

    def test_builder_builds_with_enum_keys(self, spark, tmp_path):
        from hudi_rs_spark import HudiReadConfig, HudiTableBuilder
        from hudi_rs_spark.config.keys import HudiTableConfig as K

        base = _mixed_actions_table(tmp_path).base_path
        t = (
            HudiTableBuilder.from_base_uri(base)
            .with_hudi_option(K.TimelineTimezone, "UTC")
            .with_option("hoodie.custom.flag", "on")
            .with_options({HudiReadConfig.InputPartitions: "2"})
            .build(spark)
        )
        assert t.config.props["hoodie.custom.flag"] == "on"
        assert t.config.props["hoodie.read.input.partitions"] == "2"
        assert {r["id"] for r in t.read().collect()} == {"k1"}

    def test_config_key_enums_are_strings(self):
        from hudi_rs_spark import HudiPlanConfig, HudiReadConfig
        from hudi_rs_spark.config.keys import HudiTableConfig as K

        assert K.TableName == "hoodie.table.name"
        assert HudiReadConfig.QueryType == "hoodie.read.query.type"
        assert HudiPlanConfig.ListingParallelism == "hoodie.plan.listing.parallelism"
        assert isinstance(HudiReadConfig.QueryType.value, str)


class TestConfigKeysFunction:
    def test_shape_and_dynamic_enum_construction(self):
        """Reference python/hudi/_config.py builds its enums from
        _config_keys(); the same pattern must work here."""
        from enum import Enum

        from hudi_rs_spark.config.keys import (
            HudiReadConfig,
            _config_keys,
        )

        d = _config_keys()
        assert set(d) == {"HudiTableConfig", "HudiReadConfig", "HudiPlanConfig"}
        for pairs in d.values():
            assert pairs and all(
                isinstance(n, str) and v.startswith("hoodie.") for n, v in pairs
            )
        # member names are SCREAMING_SNAKE, exactly the reference's
        # pascal_to_screaming_snake output (python/src/internal.rs) —
        # code keying on e.g. 'TABLE_NAME' must work unchanged
        assert ("TABLE_NAME", "hoodie.table.name") in d["HudiTableConfig"]
        dyn = Enum("HudiReadConfig", d["HudiReadConfig"], type=str)
        assert dyn.QUERY_TYPE.value == HudiReadConfig.QueryType.value
        assert (
            dyn.USE_READ_OPTIMIZED_MODE.value
            == HudiReadConfig.UseReadOptimizedMode.value
        )

# Driver fast lane (r14, VERDICT r13 item 1): slow-lane suite — infra/
# feature matrix whose surfaces the oracle write rows exercise end-to-end;
# the builder runs the full lane each round via `pytest -m "slow or not slow"`.
pytestmark = pytest.mark.slow
