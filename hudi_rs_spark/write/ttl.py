"""Partition TTL management — Hudi's partition-lifecycle feature
(RFC-65, ``hoodie.partition.ttl.strategy=KEEP_BY_TIME``): partitions
whose data has not been touched for longer than the retention window
are dropped with the ``delete_partition`` replacecommit
(write/dml.delete_partitions) — metadata-only, time-travel-safe,
storage reclaimed later by clean.

"Last touched" is the newest COMPLETED instant whose commit metadata
wrote to the partition (log-file NAMES carry their slice's base anchor,
not the append instant, so the timeline is the only honest signal).
Partitions alive in the fs_view but absent from every active commit's
metadata were last touched before the active timeline begins — they
expire only when the earliest active instant itself is past the
boundary (provably older), and are kept otherwise (fail open). The
reference epoch defaults to the newest instant that WROTE data to any
partition — not the wall clock (deterministic, replayable) and not the
bare latest instant (a TTL/clean action would bump that and re-expire
the survivors); pass ``as_of`` to override.

At 100 TB: one bounded active-timeline metadata walk (archival keeps it
small) + one listing + one replacecommit.
"""

from __future__ import annotations

from hudi_rs_spark.timeline.instant import parse_hudi_timestamp_millis

_DAY_MS = 24 * 60 * 60 * 1000


def expired_partitions(
    path: str, retain_days: float, as_of: str | None = None,
    policy: str = "KEEP_BY_TIME",
) -> list[str]:
    """Relative partition paths expired under ``policy``:

    - ``KEEP_BY_TIME`` (default): the partition's NEWEST touching
      instant is older than ``retain_days`` before ``as_of`` (default:
      the latest completed instant) — idle partitions expire, active
      ones are rescued by any write.
    - ``KEEP_BY_CREATION_TIME``: the partition's OLDEST touching
      instant decides — a partition expires a fixed time after its
      birth no matter how recently it was written (RFC-65's second
      strategy; rolling raw-landing zones use this).

    Unpartitioned tables never expire (the '' partition is the
    table)."""
    from hudi_rs_spark.sources.hudi import HudiTable

    table = HudiTable(path, spark=None, listing="direct")
    live = {
        (sl.partition_path or "").strip("/")
        for sl in table.get_file_slices()
    }
    live.discard("")  # unpartitioned table: the '' partition IS the table
    if not live:
        return []
    completed = sorted(
        (i for i in table.timeline.instants if i.is_completed),
        key=lambda i: i.timestamp,
    )
    if not completed:
        return []
    pol = policy.strip().upper()
    if pol not in ("KEEP_BY_TIME", "KEEP_BY_CREATION_TIME"):
        raise ValueError(
            f"unknown partition TTL policy {policy!r}: expected "
            "KEEP_BY_TIME or KEEP_BY_CREATION_TIME"
        )
    newest_touch: dict[str, str] = {}
    epoch_touch: dict[str, str] = {}  # per-policy deciding instant
    for inst in completed:
        try:
            meta = table.timeline.metadata_for(inst)
        except Exception:
            continue  # non-data action / unparseable: no touch info
        for ws in meta.write_stats:
            part = (ws.partition_path or "").strip("/")
            if part:
                newest_touch[part] = max(newest_touch.get(part, ""), inst.timestamp)
                if pol == "KEEP_BY_CREATION_TIME":
                    epoch_touch.setdefault(part, inst.timestamp)
    if pol == "KEEP_BY_TIME":
        epoch_touch = newest_touch
    if as_of is None:
        if not newest_touch:
            return []  # no data write in the active timeline: no epoch
        as_of = max(newest_touch.values())
    boundary = parse_hudi_timestamp_millis(as_of) - retain_days * _DAY_MS
    earliest_active_ms = parse_hudi_timestamp_millis(completed[0].timestamp)
    out = []
    for part in live:
        newest = epoch_touch.get(part)
        if newest is not None:
            if parse_hudi_timestamp_millis(newest) < boundary:
                out.append(part)
        elif earliest_active_ms < boundary:
            # last touch predates the active timeline (archived): it is
            # provably older than the earliest active instant
            out.append(part)
    return sorted(out)


def apply_partition_ttl(
    path: str, retain_days: float, as_of: str | None = None,
    policy: str = "KEEP_BY_TIME",
) -> list[str]:
    """Drop every expired partition (one replacecommit for all of them);
    returns the dropped relative partition paths ([] = nothing expired,
    no instant published)."""
    from hudi_rs_spark.write.dml import delete_partitions

    victims = expired_partitions(path, retain_days, as_of, policy=policy)
    if victims:
        delete_partitions(path, victims)
    return victims
