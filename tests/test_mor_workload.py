"""Plan/edge checks for the real-Hudi MOR bench workloads and empty
tables (oracle equality itself is covered by tests/test_oracle_diff.py)."""

from __future__ import annotations

import json
import os

import pytest


class TestMorWorkloadPlan:
    def test_scan_task_per_file_group(self, spark, sf_dir):
        """The connector plans one input partition per file slice: the
        scan parallelism a 1000-executor cluster would fan out over."""
        from hudi_rs_spark.workloads.mor import N_GROUPS, _connector_df

        df = _connector_df(spark, sf_dir)
        assert df.rdd.getNumPartitions() == N_GROUPS

    def test_incremental_is_merged_subset_of_snapshot(self, spark, sf_dir):
        from hudi_rs_spark.workloads import load_all

        specs = load_all()
        snap = {
            r.doc_id: r.text
            for r in specs["mor_snapshot_merge"].build(spark, sf_dir).collect()
        }
        inc = {
            r.doc_id: r.text
            for r in specs["mor_incremental_refresh"].build(spark, sf_dir).collect()
        }
        assert inc  # updates exist at every SF
        for k, v in inc.items():
            assert snap[k] == v  # incremental rows are the merged latest
        # deletes (doc_id % 13 == 0) appear in neither
        assert all(k % 13 != 0 for k in snap)
        assert all(k % 7 == 0 or k % 10 == 0 for k in inc)


class TestEmptyTable:
    def test_no_commits_with_create_schema_reads_empty(self, spark, tmp_path):
        """A just-initialized table (no commits) with
        hoodie.table.create.schema reads as an empty frame with the full
        declared schema (resolver.rs priority 3)."""
        from hudi_rs_spark.sources.hudi import HudiTable
        from hudi_rs_spark.write import HudiTableWriter, avro_schema

        w = HudiTableWriter(
            os.path.join(str(tmp_path), "fresh"),
            extra_props={
                "hoodie.table.create.schema": json.dumps(
                    avro_schema(
                        [("id", "string"), ("ts", "long"), ("val", "string")]
                    )
                )
            },
        )
        df = HudiTable(w.base_path, spark).read()
        assert df.count() == 0
        assert {"id", "ts", "val", "_hoodie_record_key"} <= set(df.columns)

    def test_no_commits_no_schema_errors_loudly(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable
        from hudi_rs_spark.write import HudiTableWriter

        w = HudiTableWriter(os.path.join(str(tmp_path), "bare"))
        with pytest.raises(ValueError, match="schema"):
            HudiTable(w.base_path, spark).read()
