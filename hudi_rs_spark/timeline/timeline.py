"""Timeline loading + selection — behavior of
/root/reference/crates/core/src/timeline/mod.rs:54-60 (model),
timeline/selector.rs:136-350 (selection), :145-171 (layouts).

Driver-side only: a timeline is a small ordered list of instants; loading
it is a single directory listing + metadata-file reads. Loaded once per
HudiTable instance (snapshot pinning — docs/reader-spec.md:295-297).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import lru_cache

from hudi_rs_spark.config.table_config import HudiTableConfig
from hudi_rs_spark.timeline.commit_metadata import CommitMetadata, parse_commit_file
from hudi_rs_spark.timeline.instant import Action, Instant, State


@dataclass
class Timeline:
    base_path: str
    timeline_dir: str
    instants: list[Instant]  # completed, sorted
    _metadata_cache: dict[str, CommitMetadata] = field(default_factory=dict)

    @classmethod
    def load(cls, base_path: str, config: HudiTableConfig) -> "Timeline":
        hoodie_dir = os.path.join(base_path, ".hoodie")
        if config.timeline_layout_version >= 2 and config.timeline_path:
            timeline_dir = os.path.join(hoodie_dir, config.timeline_path)
        else:
            timeline_dir = hoodie_dir
        instants: list[Instant] = []
        if os.path.isdir(timeline_dir):
            for name in os.listdir(timeline_dir):
                full = os.path.join(timeline_dir, name)
                if not os.path.isfile(full):
                    continue
                try:
                    instant = Instant.from_file_name(name)
                except (ValueError, KeyError):
                    continue  # non-data actions (indexing, clean, ...) or aux files
                if instant.is_completed:
                    instants.append(instant)
        instants.sort(key=lambda i: i.sort_key())
        return cls(base_path, timeline_dir, instants)

    # -- selection (selector.rs behaviors) --------------------------------
    def completed_commits(self) -> list[Instant]:
        return list(self.instants)

    def latest_commit_timestamp(self) -> str | None:
        return self.instants[-1].timestamp if self.instants else None

    def instants_as_of(self, as_of_timestamp: str | None) -> list[Instant]:
        """Instants with requested ts <= as_of (string compare is correct
        for fixed-width hudi timestamps; mixed 14/17-char compared by
        epoch millis)."""
        if as_of_timestamp is None:
            return list(self.instants)
        cutoff = _ts_key(as_of_timestamp)
        return [i for i in self.instants if _ts_key(i.timestamp) <= cutoff]

    def instants_in_range(self, start: str | None, end: str | None) -> list[Instant]:
        """Half-open (start, end] window (selector.rs:322-345 binary search
        semantics)."""
        out = []
        for i in self.instants:
            k = _ts_key(i.timestamp)
            if start is not None and k <= _ts_key(start):
                continue
            if end is not None and k > _ts_key(end):
                continue
            out.append(i)
        return out

    # -- commit metadata ---------------------------------------------------
    def metadata_for(self, instant: Instant) -> CommitMetadata:
        key = instant.timestamp
        if key not in self._metadata_cache:
            fname = _completed_file_name(instant)
            self._metadata_cache[key] = parse_commit_file(
                os.path.join(self.timeline_dir, fname)
            )
        return self._metadata_cache[key]

    def replaced_file_group_ids_as_of(self, as_of_timestamp: str | None) -> set[str]:
        """File groups excluded by replacecommits <= as_of
        (timeline/mod.rs:302-320)."""
        out: set[str] = set()
        for i in self.instants_as_of(as_of_timestamp):
            if i.is_replacecommit:
                meta = self.metadata_for(i)
                for ids in meta.replaced_file_ids.values():
                    out.update(ids)
        return out

    def latest_schema_json(self) -> str | None:
        """Schema resolution priority 1: latest commit metadata's embedded
        schema (schema/resolver.rs:41-47)."""
        for i in reversed(self.instants):
            meta = self.metadata_for(i)
            if meta.schema_json:
                return meta.schema_json
        return None


def _ts_key(ts: str) -> int:
    from hudi_rs_spark.timeline.instant import parse_hudi_timestamp_millis

    return parse_hudi_timestamp_millis(ts)


def _completed_file_name(instant: Instant) -> str:
    if instant.completion_timestamp:
        return f"{instant.timestamp}_{instant.completion_timestamp}.{instant.action.value}"
    return f"{instant.timestamp}.{instant.action.value}"
