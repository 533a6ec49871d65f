"""Metadata-table files-partition listing (ops 8/20 fast path): HFile
reader, record decode + merge, and MDT-vs-direct listing equality on the
reference golden fixture (pinned values from metadata/table/mod.rs tests)."""

from __future__ import annotations

import os

import pytest

from hudi_rs_spark.hfile import HFile
from hudi_rs_spark.metadata import read_files_partition
from hudi_rs_spark.metadata.files_partition import (
    ALL_PARTITIONS_KEY,
    FilesPartitionRecord,
    _merge_into,
    list_partition_files_via_mdt,
)

CHENNAI_EXPECTED = {
    "6e1d5cc4-c487-487d-abbe-fe9b30b1c0cc-0_2-986-2794_20251220210108078.parquet",
    "6e1d5cc4-c487-487d-abbe-fe9b30b1c0cc-0_0-1112-3190_20251220210129235.parquet",
    ".6e1d5cc4-c487-487d-abbe-fe9b30b1c0cc-0_20251220210127080.log.1_0-1072-3078",
    ".6e1d5cc4-c487-487d-abbe-fe9b30b1c0cc-0_20251220210128625.log.1_0-1097-3150",
}


class TestHFileReader:
    def test_reads_files_partition_hfile(self, v8_trips_table):
        p = os.path.join(
            v8_trips_table,
            ".hoodie/metadata/files/files-0000-0_23-1133-3302_20251220210130942.hfile",
        )
        hf = HFile.from_path(p)
        assert hf.entry_count == 4
        keys = [k.decode() for k, _ in hf.records()]
        assert keys == sorted(keys)  # HFile cells are key-ordered
        assert set(keys) == {
            ALL_PARTITIONS_KEY,
            "city=chennai",
            "city=san_francisco",
            "city=sao_paulo",
        }
        assert hf.avro_schema()["name"] == "HoodieMetadataRecord"


class TestFilesPartitionRead:
    """Pinned to the reference's own golden test
    (metadata/table/mod.rs hudi_table_read_metadata_table_files_partition)."""

    def test_golden_records(self, v8_trips_table):
        recs = read_files_partition(v8_trips_table)
        assert len(recs) == 4
        parts = set(recs[ALL_PARTITIONS_KEY].partition_names())
        assert parts == {"city=chennai", "city=san_francisco", "city=sao_paulo"}
        chennai = recs["city=chennai"]
        assert {n for n, _ in chennai.active_files()} == CHENNAI_EXPECTED
        assert sum(s for _, s in chennai.active_files()) > 0

    def test_key_filtered_read(self, v8_trips_table):
        recs = read_files_partition(v8_trips_table, {"city=chennai"})
        assert set(recs) == {"city=chennai"}
        assert {n for n, _ in recs["city=chennai"].active_files()} == CHENNAI_EXPECTED


class TestMergeSemantics:
    """merger.rs:178-212 truth table."""

    def test_deletion_cancels_live_entry(self):
        a = FilesPartitionRecord("p", {"f1": (10, False), "f2": (5, False)})
        _merge_into(a, FilesPartitionRecord("p", {"f1": (0, True)}))
        assert a.files == {"f2": (5, False)}

    def test_tombstone_keeps_newer_tombstone(self):
        a = FilesPartitionRecord("p", {"f1": (0, True)})
        _merge_into(a, FilesPartitionRecord("p", {"f1": (1, True)}))
        assert a.files == {"f1": (1, True)}

    def test_live_keeps_max_size(self):
        a = FilesPartitionRecord("p", {"f1": (10, False)})
        _merge_into(a, FilesPartitionRecord("p", {"f1": (7, False)}))
        assert a.files == {"f1": (10, False)}
        _merge_into(a, FilesPartitionRecord("p", {"f1": (12, False)}))
        assert a.files == {"f1": (12, False)}

    def test_new_entries_added(self):
        a = FilesPartitionRecord("p", {})
        _merge_into(a, FilesPartitionRecord("p", {"f1": (3, False), "f2": (0, True)}))
        assert a.files == {"f1": (3, False), "f2": (0, True)}


def _slice_key(sl):
    return (
        sl.partition_path,
        sl.base_file.file_name,
        tuple(sorted(lf.file_name for lf in sl.log_files)),
    )


class TestListingEquality:
    def test_mdt_matches_direct_listing(self, spark, v8_trips_table):
        from hudi_rs_spark.sources.hudi import HudiTable

        direct = HudiTable(v8_trips_table, spark, listing="direct").get_file_slices()
        via_mdt = HudiTable(v8_trips_table, spark, listing="mdt").get_file_slices()
        assert sorted(map(_slice_key, direct)) == sorted(map(_slice_key, via_mdt))

    def test_mdt_listing_never_walks_storage(self, spark, v8_trips_table, monkeypatch):
        """The point of the fast path: planning touches NO data-table
        partition dirs (O(partitions) MDT records instead of O(files)
        listing)."""
        import hudi_rs_spark.fs.fs_view as fs_view
        from hudi_rs_spark.sources.hudi import HudiTable

        t = HudiTable(v8_trips_table, spark, listing="mdt")
        real = fs_view.list_data_files

        def guard(base_path):
            # listing the MDT itself (one tiny fixed dir) is fine; walking
            # the DATA table's partition tree is what the fast path avoids
            if not base_path.endswith("/.hoodie/metadata"):
                raise AssertionError(f"data-table storage walk attempted: {base_path}")
            return real(base_path)

        monkeypatch.setattr(fs_view, "list_data_files", guard)
        slices = t.get_file_slices()
        assert len(slices) == 3

    def test_snapshot_read_equal_via_both(self, spark, v8_trips_table):
        from hudi_rs_spark.sources.hudi import HudiTable

        a = (
            HudiTable(v8_trips_table, spark, listing="direct")
            .read()
            .orderBy("_hoodie_record_key")
            .collect()
        )
        b = (
            HudiTable(v8_trips_table, spark, listing="mdt")
            .read()
            .orderBy("_hoodie_record_key")
            .collect()
        )
        assert a == b

    def test_mdt_column_stats_match_parquet_footers(self, v8_trips_table):
        """MDT-sourced min/max must agree with the physical footer stats
        for every (parquet file, column) both sides know."""
        import os

        from hudi_rs_spark.metadata.column_stats import read_column_stats
        from hudi_rs_spark.plans.file_pruner import parquet_column_stats

        stats = read_column_stats(v8_trips_table)
        assert stats  # fixture has a populated column_stats partition
        checked = 0
        for fname, cols in stats.items():
            if not fname.endswith(".parquet"):
                continue
            # find the file under its partition dir
            for part in ("city=chennai", "city=san_francisco", "city=sao_paulo"):
                p = os.path.join(v8_trips_table, part, fname)
                if os.path.exists(p):
                    footer = parquet_column_stats(p)
                    for col, (mn, mx) in cols.items():
                        if col in footer and isinstance(mn, (str, int, float)):
                            assert footer[col] == (mn, mx), (fname, col)
                            checked += 1
        assert checked > 10

    def test_stats_prune_via_mdt_without_footer_reads(
        self, spark, v8_trips_table, monkeypatch
    ):
        from hudi_rs_spark.config.read_config import HudiReadOptions
        from hudi_rs_spark.plans.partition_pruner import Filter
        from hudi_rs_spark.sources.hudi import HudiTable
        import hudi_rs_spark.plans.file_pruner as fp

        t = HudiTable(v8_trips_table, spark, listing="mdt")
        slices = t.get_file_slices()

        def no_footers(path):
            raise AssertionError(f"footer read attempted: {path}")

        # _stats_prune's footer fallback goes through parquet_footer_stats
        # (r7); patch BOTH entry points so any footer read trips the guard
        monkeypatch.setattr(fp, "parquet_column_stats", no_footers)
        monkeypatch.setattr(fp, "parquet_footer_stats", no_footers)
        ro = HudiReadOptions(use_read_optimized_mode=True)
        # a value outside every file's [min,max] prunes everything
        none_left = t._stats_prune(slices, [Filter("driver", "=", "driver-ZZZ")], ro)
        assert none_left == []
        # fail-open on a matching value: files with that driver survive
        kept = t._stats_prune(slices, [Filter("city", "=", "chennai")], ro)
        assert 0 < len(kept) < len(slices)

    def test_partition_stats_union_bounds(self, v8_trips_table):
        from hudi_rs_spark.metadata.column_stats import read_partition_stats

        ps = read_partition_stats(v8_trips_table, {"driver"})
        assert set(ps) == {"city=chennai", "city=san_francisco", "city=sao_paulo"}
        mn, mx = ps["city=san_francisco"]["driver"]
        assert mn <= "driver-K" and mx >= "driver-O"  # union over all writes

    def test_partition_stats_prune_before_listing(self, spark, v8_trips_table):
        from hudi_rs_spark.plans.partition_pruner import Filter
        from hudi_rs_spark.sources.hudi import HudiTable

        t = HudiTable(v8_trips_table, spark, listing="mdt")
        # value outside every partition's driver bounds: all partitions
        # pruned before any file is planned
        assert t.get_file_slices(filters=[Filter("driver", ">", "driver-zzz")]) == []
        # value inside at least one partition's bounds: those survive
        some = t.get_file_slices(filters=[Filter("driver", "=", "driver-S")])
        assert 0 < len(some) <= 3
        # snapshot correctness with the stats-pruned plan
        from hudi_rs_spark.config.read_config import HudiReadOptions

        rows = t.read(HudiReadOptions(filters=[("driver", "=", "driver-S")])).collect()
        assert all(r["driver"] == "driver-S" for r in rows)

    def test_uuid_file_id_decode(self):
        from hudi_rs_spark.metadata.record_index import _file_id

        ri = {
            "fileIdEncoding": 0,
            "fileIdHighBits": 247114695546521503,
            "fileIdLowBits": -4833926705110317157,
            "fileIndex": 0,
        }
        assert _file_id(ri) == "036ded81-9ed4-479f-bcea-7145dfa0079b-0"
        assert _file_id({"fileIdEncoding": 1, "fileId": "abc-0"}) == "abc-0"

    def test_record_index_point_lookup(self, spark, v8_trips_table):
        from hudi_rs_spark.metadata.record_index import read_record_index
        from hudi_rs_spark.sources.hudi import HudiTable

        t = HudiTable(v8_trips_table, spark)
        all_rows = t.read().select("_hoodie_record_key", "fare").collect()
        target = sorted(r["_hoodie_record_key"] for r in all_rows)[0]
        expected_fare = {r["_hoodie_record_key"]: r["fare"] for r in all_rows}[target]

        idx = read_record_index(v8_trips_table, {target})
        assert target in idx
        part, fid = idx[target]
        assert part.startswith("city=") and fid.endswith("-0")

        got = t.point_lookup([target]).collect()
        assert len(got) == 1
        assert got[0]["_hoodie_record_key"] == target
        assert got[0]["fare"] == expected_fare

    def test_point_lookup_scans_one_file_group(self, spark, v8_trips_table):
        from hudi_rs_spark.metadata.record_index import read_record_index
        from hudi_rs_spark.sources.hudi import HudiTable

        t = HudiTable(v8_trips_table, spark)
        key = t.read().select("_hoodie_record_key").first()[0]
        (part, fid) = read_record_index(v8_trips_table, {key})[key]
        seen = {}
        orig = t._execute_slices

        def spy(slices, *a, **kw):
            seen["slices"] = slices
            return orig(slices, *a, **kw)

        t._execute_slices = spy
        t.point_lookup([key]).collect()
        assert [
            (s.partition_path, s.base_file.file_id) for s in seen["slices"]
        ] == [(part, fid)]

    def test_secondary_index_lookup_matches_scan(self, spark, v8_trips_table):
        from hudi_rs_spark.metadata.secondary_index import (
            list_secondary_indexes,
            read_secondary_index,
        )
        from hudi_rs_spark.config.table_config import HudiTableConfig
        from hudi_rs_spark.sources.hudi import HudiTable

        cfg = HudiTableConfig.from_base_path(v8_trips_table)
        assert list_secondary_indexes(cfg) == ["secondary_index_rider_idx"]

        t = HudiTable(v8_trips_table, spark)
        full = t.read().select("rider", "_hoodie_record_key").collect()
        by_rider: dict[str, set[str]] = {}
        for r in full:
            by_rider.setdefault(r["rider"], set()).add(r["_hoodie_record_key"])
        rider = sorted(by_rider)[0]

        idx = read_secondary_index(
            v8_trips_table, "secondary_index_rider_idx", {rider}
        )
        assert idx.get(rider) == by_rider[rider]

        got = t.lookup_by_secondary_key("rider_idx", [rider]).collect()
        assert {r["_hoodie_record_key"] for r in got} == by_rider[rider]
        assert all(r["rider"] == rider for r in got)

    def test_sampled_table_stats_close_to_exact(self, spark, v8_trips_table):
        from hudi_rs_spark.sources.hudi import HudiTable

        t = HudiTable(v8_trips_table, spark)
        exact_rows, exact_bytes = t.compute_table_stats(exact=True)
        est_rows, est_bytes = t.compute_table_stats(exact=False)
        assert est_bytes == exact_bytes  # sizes come from the listing
        assert exact_rows > 0
        # one-footer sampling: order-of-magnitude agreement is the contract
        assert 0.3 <= est_rows / exact_rows <= 3.0

    def test_partition_pruned_mdt_listing(self, spark, v8_trips_table):
        from hudi_rs_spark.config.table_config import HudiTableConfig

        cfg = HudiTableConfig.from_base_path(v8_trips_table)
        entries = list_partition_files_via_mdt(
            v8_trips_table, cfg, lambda p: p == "city=chennai"
        )
        assert entries and all(p == "city=chennai" for p, _, _ in entries)
        assert {n for _, n, _ in entries} == CHENNAI_EXPECTED

# Driver fast lane (r14, VERDICT r13 item 1): slow-lane suite — infra/
# feature matrix whose surfaces the oracle write rows exercise end-to-end;
# the builder runs the full lane each round via `pytest -m "slow or not slow"`.
pytestmark = pytest.mark.slow
