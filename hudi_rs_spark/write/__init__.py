"""Write-side API: Hudi tables from Spark DataFrames, plus table
services.

The reference is read-only (hudi-rs has no writer; its fixtures come
from Spark/Hudi jobs), so everything here is beyond-reference capability
built on the same format knowledge as the readers: log-block framing and
avro encoding per the public Hudi spec as re-expressed in
``logfile/reader.py``, timeline file naming per ``timeline/instant.py``.

Surfaces:

- ``df.write.format("hudi_py")`` — COW/MOR insert, append/overwrite
  (``writer.HudiPyBatchWriter``; executor-side Arrow encode per task);
- ``upsert.upsert`` / ``upsert.delete`` — MOR log-block upserts routed
  to existing file groups via a distributed location index;
- ``compact.compact`` — per-slice base+log merge, one ``commit``;
- ``cluster.cluster`` — small-file rewrite (optionally sort-ordered),
  one ``replacecommit``;
- ``clean.clean`` — KEEP_LATEST_COMMITS storage reclamation, one
  ``.clean`` instant;
- ``rollback.rollback_failed_writes`` — orphan cleanup after a crashed
  write (delete orphan bases / void orphan log blocks), one
  ``.rollback`` instant;
- ``savepoint.savepoint`` / ``savepoint.restore`` — pin an instant
  against cleaning; destructively rewind the table to a pinned instant;
- ``stream.HudiPyStreamWriter`` — ``writeStream.format("hudi_py")``,
  one commit per micro-batch, exactly-once across restarts;
- ``mdt.apply_commit_to_mdt`` — metadata-table files partition kept in
  step with every commit (HFile v3 + MDT log blocks);
- ``mdt_compact.compact_mdt`` — fold MDT log chains into fresh HFile
  bases so point-lookup decode stays bounded by commits-since-fold;
- ``archive.archive_timeline`` — move the oldest completed instants
  into the archived layouts the readers parse (LSM history / layout-1
  folder), bounding the active timeline a streaming sink grows;
- ``maintenance.maybe_auto_maintain`` — inline archival + MDT folding
  after every commit when ``hoodie.keep.max/min.commits`` /
  ``hoodie.metadata.compact.max.delta.commits`` thresholds are crossed
  (Hudi's own defaults: growth management without operator action);
- ``hoodie.write.concurrency.mode=NON_BLOCKING_CONCURRENCY_CONTROL``
  (v8+ MOR) — concurrent log-append deltacommits to one file group all
  land; the readers' merge linearizes them by ordering field + instant
  order (completion-time semantics). Base rewrites and replacements
  still conflict in either mode;
- ``merge_into.merge_into`` — Spark SQL MERGE semantics (matched
  delete/update with conditions, not-matched insert) as one snapshot
  join plus one upsert;
- ``dml.update_where`` / ``dml.delete_where`` — SQL UPDATE/DELETE
  twins over the pruned snapshot scan; ``dml.delete_partitions`` —
  ALTER TABLE DROP PARTITION as one metadata-only replacecommit;
- ``sql.hudi_sql`` — SQL-statement router: parses the standard
  MERGE INTO / UPDATE / DELETE FROM / ALTER TABLE DROP PARTITION
  grammar and dispatches to the APIs above (expressions pass through
  verbatim as Catalyst SQL);
- ``ttl.apply_partition_ttl`` — partition lifecycle (RFC-65
  KEEP_BY_TIME): partitions untouched for the retention window drop
  via delete_partition, epoch = newest data-writing instant
  (deterministic, never the wall clock);
- ``async_compact.schedule_compaction`` /
  ``run_scheduled_compaction`` — non-blocking compaction: a
  ``{I}.compaction.requested`` plan marker; writers anchor new logs at
  the plan instant, readers merge them onto the committed slice, and
  execution upgrades the slice in place (ingestion never blocks or
  aborts on a scheduled compaction);
- ``async_cluster.schedule_clustering`` /
  ``run_scheduled_clustering`` — non-blocking clustering: a
  ``{I}.clustering.requested`` plan pinning the input slices; writers
  anchor new logs at the plan instant, execution rewrites the pinned
  inputs into new groups and MIGRATES the pending-window logs onto
  them (the file id changes, so unlike compaction the anchored logs
  must be re-parented), publishing one replacecommit;
- ``expr_index.create_expression_index`` — Hudi 1.0 functional index:
  per-base-file min/max of a SQL EXPRESSION in an ``expr_index_{name}``
  MDT partition; ``HudiTable.read_where_expression`` prunes files by
  the indexed interval with a residual row filter (fail-open on
  unindexed/logged slices);
- ``hoodie.index.type=BUCKET`` — bucket index (write/bucket.py): keys
  hash to a fixed number of buckets, one file group per bucket per
  partition, upsert tagging is a pure map-side hash (no index read, no
  tag join); bucket tables are written through ``upsert`` (the raw
  writer rejects untagged rows); ``bucket.convert_to_bucket`` adopts
  the index on an existing table via one hash-regrouped rewrite +
  replacecommit; ``bucket.split_bucket`` rescales one bucket into two
  children via an extendible-hash split map (routing stays one JVM
  expression) and ``bucket.merge_buckets`` folds a split's children
  back into their parent (no shuffle: both children's keys route to
  the parent by construction) — the incremental answer to Hudi's
  CONSISTENT_HASHING engine, whose per-partition
  ``.hashing_meta`` JSON layout is persisted on every rescale;
- ``mdt_bloom.backfill_bloom_filters`` — bloom_filters MDT partition
  for existing tables (the writer emits blooms inline when
  ``metadata.bloomfilter.enable`` is set; upsert tagging then prunes
  its index scan to bloom-candidate files);
- ``validate.validate_table`` — metadata validator (Hudi's
  MetadataTableValidator analog): timeline parse/uniqueness, commit-vs-
  storage file existence, MDT listing parity, record-index spot checks,
  stale claims, orphan/suspect files, bucket invariants;
- ``table.HudiTableWriter`` — low-level file-by-file fixture writer
  (v6 layout-1, v8 layout-2) the services grew out of.

Storage: every byte routes through ``fs/storage.py`` — the same
scheme-dispatched backends the readers use (local, s3/gs/hdfs via
pyarrow.fs, memory:// for tests). Local paths keep plain-path fast
paths; object stores get single-PUT atomic publishes (HDFS
write-temp+move); appends degrade to read+concat+PUT on buckets, which
MDT compaction and per-write log rolling keep bounded. Executors
resolve their own backend from the ``storage.*`` options shipped in
WriteConfig.

Concurrency: optimistic multi-writer (``concurrency.py``) — every
commit claims its instant through an atomic create (a second writer
racing the SAME instant fails before any data lands), a live claim
shields the writer's in-flight MDT appends from other writers'
init-time purges, and at commit time each writer conflict-checks the
instants that completed since its read point: overlapping file groups
(or any concurrent commit, for overwrite/replace) raise
``ConcurrentWriteError`` BEFORE publishing — Hudi's OCC, preserving the
linearized timeline the readers' merge semantics assume. Disjoint
writers commit concurrently. Bucket stores get atomic claims via an
injected native conditional PUT (``fs/storage.ArrowFSStorage``);
pluggable lock providers cover stores without one.
"""

from hudi_rs_spark.write.logblocks import (  # noqa: F401
    CDC_SCHEMA,
    LSM_HISTORY_SCHEMA,
    avro_data_block,
    avro_schema,
    cdc_block,
    delete_block,
    encode_datum,
    frame_block,
    ocf_bytes,
    parquet_bytes,
    parquet_data_block,
    rollback_block,
    write_lsm_history,
)
from hudi_rs_spark.write.archive import archive_timeline  # noqa: F401
from hudi_rs_spark.write.concurrency import (  # noqa: F401
    ConcurrentWriteError,
    LockProvider,
    StorageLockProvider,
    check_commit_conflicts,
    completed_instant_set,
)
from hudi_rs_spark.write.async_cluster import (  # noqa: F401
    run_scheduled_clustering,
    schedule_clustering,
)
from hudi_rs_spark.write.async_compact import (  # noqa: F401
    run_scheduled_compaction,
    schedule_compaction,
)
from hudi_rs_spark.write.clean import clean  # noqa: F401
from hudi_rs_spark.write.cluster import cluster  # noqa: F401
from hudi_rs_spark.write.compact import compact  # noqa: F401
from hudi_rs_spark.write.mdt_compact import clean_mdt, compact_mdt  # noqa: F401
from hudi_rs_spark.write.rollback import rollback_failed_writes  # noqa: F401
from hudi_rs_spark.write.savepoint import restore, savepoint  # noqa: F401
from hudi_rs_spark.write.sql import (  # noqa: F401
    SqlDmlError,
    hudi_sql,
    hudi_sql_script,
)
from hudi_rs_spark.write.table import META_COLS, HudiTableWriter  # noqa: F401
from hudi_rs_spark.write.dml import (  # noqa: F401
    delete_partitions,
    delete_where,
    truncate_table,
    update_where,
)
from hudi_rs_spark.write.merge_into import merge_into  # noqa: F401
from hudi_rs_spark.write.ddl import (  # noqa: F401
    DdlError,
    add_columns,
    drop_columns,
    rename_column,
)
from hudi_rs_spark.write.bucket import (  # noqa: F401
    convert_to_bucket,
    merge_buckets,
    rescale_oversized_buckets,
    rescale_undersized_buckets,
    split_bucket,
)
from hudi_rs_spark.write.bootstrap import bootstrap_table  # noqa: F401
from hudi_rs_spark.write.callbacks import (  # noqa: F401
    register_commit_callback,
    unregister_commit_callback,
)
from hudi_rs_spark.write.compact_strategy import (  # noqa: F401
    select_compaction_slices,
)
from hudi_rs_spark.write.precommit import (  # noqa: F401
    PreCommitValidationError,
    run_precommit_validators,
)
from hudi_rs_spark.write.schema_evolve import (  # noqa: F401
    SchemaEvolutionError,
    reconcile_frame,
    union_commit_schema,
)
from hudi_rs_spark.write.savepoint import delete_savepoint  # noqa: F401
from hudi_rs_spark.write.upgrade import (  # noqa: F401
    downgrade_table,
    upgrade_table,
)
from hudi_rs_spark.write.expr_index import (  # noqa: F401
    create_expression_index,
    drop_expression_index,
)
from hudi_rs_spark.write.mdt_bloom import backfill_bloom_filters  # noqa: F401
from hudi_rs_spark.write.ttl import apply_partition_ttl, expired_partitions  # noqa: F401
from hudi_rs_spark.write.validate import validate_table  # noqa: F401
from hudi_rs_spark.write.upsert import bulk_insert, delete, upsert  # noqa: F401
