"""Clean table service: delete file slices no retained snapshot can
reach — the storage-reclamation dual of compaction/clustering, which
both leave superseded slices on disk for time travel.

KEEP_LATEST_COMMITS semantics (the Hudi default cleaner policy):

- the retention boundary is the ``retain_commits``-th newest completed
  data instant; every snapshot as-of an instant >= boundary must stay
  byte-identical after cleaning;
- per file group, the latest slice at or before the boundary still
  serves ``as_of == boundary`` reads and is KEPT; strictly older slices
  (and their absorbed log files) are deleted;
- file groups replaced by a replacecommit <= boundary are invisible to
  every retained snapshot: ALL their slices are deleted;
- slices at pending instants are never touched (an in-flight writer may
  still complete them); slices at unknown instants (orphans from
  crashed writes) are rollback's job, not clean's.

Time travel earlier than the boundary is undefined after a clean — the
standard Hudi caveat; the boundary is recorded in the ``.clean``
instant's metadata (``earliestCommitToRetain``) so readers/operators
can check. The readers' timeline parser skips ``.clean`` instants (non-
data action), so published clean instants never perturb scans.

Scale note: the work is metadata-sized — one listing (MDT fast path
when enabled) + an O(slices) sweep; deletions are issued through the
storage abstraction on the driver. At 100 TB the deletion fan-out could
be distributed, but the decision set (file names) always fits driver
memory — it is bounded by file COUNT, not data bytes.
"""

from __future__ import annotations

import json
import os

from hudi_rs_spark.write.config import WriteConfig, new_instant


def clean(path: str, retain_commits: int = 10, instant: str | None = None) -> int:
    """Apply KEEP_LATEST_COMMITS cleaning; returns the number of files
    deleted (0 = nothing to clean, no instant published)."""
    from hudi_rs_spark.config.table_config import HudiTableConfig
    from hudi_rs_spark.fs.fs_view import build_file_groups
    from hudi_rs_spark.sources.hudi import HudiTable
    from hudi_rs_spark.write.writer import timeline_dir

    table = HudiTable(path, spark=None, listing="direct")
    timeline = table.timeline
    completed = sorted(timeline.instants, key=lambda i: i.sort_key())
    if len(completed) <= retain_commits:
        return 0
    boundary = completed[-retain_commits].timestamp
    completed_ts = {i.timestamp for i in completed}
    pending_ts = set(timeline.pending_timestamps)
    # savepoints pin additional retention points: every snapshot as-of a
    # pinned instant must survive cleaning (write/savepoint.py)
    from hudi_rs_spark.write.savepoint import savepointed_instants

    retention = {boundary} | {
        ts for ts in savepointed_instants(path) if ts <= boundary
    }
    min_retention = min(retention)
    replaced_map = timeline.replaced_file_groups_as_of(min_retention)

    groups = build_file_groups(path, table._completion_times())
    deleted: dict[str, list[str]] = {}
    to_remove: list[str] = []
    for (partition, fid), group in groups.items():
        slices = sorted(group.slices.items())  # by commit ts ascending
        replace_ts = replaced_map.get((partition, fid))
        if replace_ts is not None:
            # only the slices the replacecommit actually superseded: a
            # slice created AFTER it (bucket merge resurrection) lives
            # by the normal retention rules below
            victims = [s for ts, s in slices if ts <= replace_ts]
            live = [(ts, s) for ts, s in slices if ts > replace_ts]
            if live:
                eligible = [
                    (ts, s) for ts, s in live
                    if ts <= boundary and ts in completed_ts
                ]
                keep = set()
                for point in retention:
                    at = [ts for ts, _ in eligible if ts <= point]
                    if at:
                        keep.add(max(at))
                victims += [s for ts, s in eligible if ts not in keep]
        else:
            eligible = [
                (ts, s) for ts, s in slices
                if ts <= boundary and ts in completed_ts
            ]
            # each retention point (boundary + savepoints) is served by
            # its newest at-or-before slice; everything else older than
            # the boundary is unreachable
            keep = set()
            for point in retention:
                at = [ts for ts, _ in eligible if ts <= point]
                if at:
                    keep.add(max(at))
            victims = [s for ts, s in eligible if ts not in keep]
        for s in victims:
            if s.commit_timestamp in pending_ts:
                continue
            rels = []
            if s.base_file is not None:
                rels.append(s.base_file_relative_path())
            rels.extend(s.log_file_relative_paths())
            for rel in rels:
                to_remove.append(rel)
                deleted.setdefault(partition, []).append(os.path.basename(rel))
    # CDC sidecars (``.{fid}_{instant}.cdc.*``) are not part of any file
    # slice; reclaim those older than every retention point — the change
    # feed below the boundary is undefined after a clean, same caveat as
    # time travel. (Advice r9: without this, a streaming sink's sidecars
    # accumulate forever.)
    from hudi_rs_spark.fs.fs_view import list_data_files
    from hudi_rs_spark.write.rollback import _cdc_instant

    for partition, name, _size in list(list_data_files(path)):
        if not (name.startswith(".") and ".cdc." in name):
            continue
        ts = _cdc_instant(name)
        if ts and ts < min_retention and ts not in pending_ts:
            rel = f"{partition}/{name}" if partition else name
            to_remove.append(rel)
            deleted.setdefault(partition, []).append(name)

    if not to_remove:
        return 0

    from hudi_rs_spark.write.writer import _fs

    st = _fs(path)
    for rel in to_remove:
        try:
            st.remove(f"{path}/{rel}")
        except OSError:
            pass

    config = HudiTableConfig.from_base_path(path)
    instant = instant or new_instant()
    cfg = WriteConfig(
        path=path,
        table_name=config.table_name,
        record_key_fields=tuple(config.record_key_fields) or ("id",),
        precombine_field=(config.ordering_fields or [None])[0],
        partition_fields=tuple(config.partition_fields),
        table_type=config.table_type.value,
        table_version=config.table_version,
        instant=instant,
        operation="clean",
    )
    # .clean instant: earliestCommitToRetain + per-partition deletions
    # (the readers' timeline parser skips the action; this is operator
    # metadata, mirroring Hudi's HoodieCleanMetadata essentials)
    from hudi_rs_spark.write.concurrency import claim_instant, release_instant

    claim_instant(cfg)
    instant = cfg.instant  # claim may regenerate on a timestamp collision
    tdir = timeline_dir(cfg)
    if cfg.table_version >= 8:
        name = f"{instant}_{max(new_instant(), instant)}.clean"
    else:
        name = f"{instant}.clean"
    meta = {
        "earliestCommitToRetain": boundary,
        "totalFilesDeleted": len(to_remove),
        "partitionMetadata": {
            part: {"deletePathPatterns": names}
            for part, names in sorted(deleted.items())
        },
    }
    st.publish_bytes(f"{tdir}/{name}", json.dumps(meta).encode())

    meta_parts = config.props.get("hoodie.table.metadata.partitions", "")
    if "files" in meta_parts:
        from hudi_rs_spark.write.mdt import apply_deletions_to_mdt

        apply_deletions_to_mdt(cfg, deleted)
    release_instant(cfg)
    return len(to_remove)
