"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query (TPC-H-style q5 6-way join) at sf0.001.
queries()    — every implemented operator from SURVEY.md §2 that runs on
               the driver's plain-parquet tables, via the workload
               registry (hudi_rs_spark/workloads/*).
oracle_sql() — matching DuckDB SQL for each query (None entries omitted ->
               rows-only check).

The Hudi-format reader itself (timeline/MOR merge/time travel on real
Hudi tables) is exercised by pytest against the reference's golden
fixtures — see tests/test_hudi_read.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# Driver-row freshness rotation (every query passes the identical
# local DuckDB oracle in tests/test_oracle_diff.py): lead with this
# round's NEW/CHANGED rows, then the THIRTEEN rows whose newest driver
# evidence is r10 (the planned agers from r12's boundary comment), then
# 34 of the 50 r11-evidence rows — prioritizing everything the r13 code
# changes touch (log-decode rename mapping -> mor/write lifecycle rows;
# pin() backend -> the iterative dedup/similarity rows). The FIFTEEN
# stable r11 rows listed right after position 50 (pure-SQL TPC-H head,
# the merge_* window composites, exact/normalized dedup, token stats —
# zero code touched since r11) age to r14 and lead its window;
# everything r12-fresh follows in stable registry order.
_SURFACE_FIRST = [
    # NEW r13 rows — first-time driver evidence
    "write_sql_timetravel",  # SELECT ... TIMESTAMP AS OF via the router
    "write_sql_insert",  # empty CREATE TABLE + INSERT SELECT/PARTITION
    "text_decontam_bloom",  # broadcast-Bloom prefiltered decontamination
    "sim_int8_topk",  # int8-quantized cosine top-k (4x corpus bytes cut)
    "write_incremental_view",  # CDC-delta view refresh == recompute
    "write_bulk_insert",  # GLOBAL_SORT bulk load layout
    # REWORKED r13 — now renames over LIVE MOR logs (3 schema epochs)
    "write_ddl_columns",
    # newest evidence r10 — the planned r12->r13 agers (13)
    "text_length_outliers", "text_rarity_score", "text_tfidf_topterms",
    "win_lag_delta", "win_running_total", "win_sessionize",
    "win_top3_events_per_user", "win_user_rank",
    "mm_audio_features", "mm_frame_sample", "mm_image_features",
    "mm_resize_features", "json_props_stats",
    # newest evidence r11 — refresh 35 of 50 (rows touching r13's
    # changed code first: MOR log decode, write lifecycle, pin())
    "mor_snapshot_merge", "mor_incremental_refresh",
    "write_compacted_snapshot", "write_clustered_snapshot",
    "write_point_lookup", "write_lance_roundtrip",
    "write_bucket_rescaled", "write_async_clustered", "write_sql_dml",
    "write_partial_update", "write_savepoint_restore",
    "write_partition_ttl", "write_dms_ingest", "write_insert_overwrite",
    "write_bootstrap", "write_sql_procedures", "write_upgrade",
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_cluster_canonical",
    "dedup_simhash", "dedup_incremental",
    "sim_embedding_near_dups", "sim_semdedup",
    "sample_temperature_mix", "sample_shuffle_shard",
    "sample_split_leakfree",
    "text_quality", "text_lang_id",
    "text_interdup_score",
    # --- 50-row window boundary: the twenty stable r11 rows below
    # age to r14 (pure relational SQL + merge composites + gopher/
    # chunking/repetition/PII/fingerprint rules untouched since r11 —
    # least regression surface; chunk_overlap, repetition, pii_scrub
    # and fingerprint_groups traded in for the new bloom-decontam,
    # int8-ANN, incremental-view and bulk-insert rows)
    "text_fingerprint_groups", "text_pii_scrub", "text_repetition",
    "text_chunk_overlap", "text_gopher_filter",
    "q1_pricing_summary", "q3_shipping_priority", "q4_order_priority",
    "q5_local_supplier_volume", "q6_forecast_revenue", "q19_disjunctive",
    "q22_no_order_customers",
    "merge_latest_state", "merge_incremental_window",
    "merge_asof_snapshot", "merge_delete_aware", "merge_append_only",
    "dedup_exact", "dedup_normalized", "text_token_stats",
]


def _registry():
    from hudi_rs_spark.workloads import load_all

    specs = load_all()
    ordered = {n: specs[n] for n in _SURFACE_FIRST if n in specs}
    ordered.update({n: s for n, s in specs.items() if n not in ordered})
    return ordered


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from hudi_rs_spark.session import configure_session

    configure_session(spark)
    specs = _registry()
    return specs["q1_pricing_summary"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from hudi_rs_spark.session import configure_session

    specs = _registry()

    def make(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_session(spark)
            return spec.build(spark, sf_dir)

        return run

    return {name: make(spec) for name, spec in specs.items()}


def oracle_sql() -> dict[str, str]:
    specs = _registry()
    return {name: spec.oracle for name, spec in specs.items() if spec.oracle}
