"""File groups, slices, base/log file name parsing.

Behavior of /root/reference/crates/core/src/file_group/mod.rs:47-51
(model), base_file/mod.rs:96 (base name format), log_file/mod.rs:77-123
(log name format), mod.rs:196-281 (log association + as-of selection).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class BaseFile:
    file_id: str
    write_token: str
    commit_timestamp: str
    extension: str
    file_name: str
    size: int = 0

    @classmethod
    def parse(cls, file_name: str, size: int = 0) -> "BaseFile":
        # {file_id}_{write_token}_{commit_ts}.{ext}
        stem, _, ext = file_name.rpartition(".")
        parts = stem.split("_")
        if len(parts) != 3 or not ext:
            raise ValueError(f"bad base file name: {file_name}")
        file_id, write_token, ts = parts
        if not file_id or not write_token or not ts:
            raise ValueError(f"bad base file name: {file_name}")
        return cls(file_id, write_token, ts, ext, file_name, size)


@dataclass(frozen=True)
class LogFile:
    file_id: str
    timestamp: str  # base/deltacommit requested ts embedded in the name
    extension: str
    version: int
    write_token: str
    file_name: str
    size: int = 0
    completion_timestamp: str | None = None  # set from timeline (v8+)

    @classmethod
    def parse(cls, file_name: str, size: int = 0) -> "LogFile":
        # .{file_id}_{ts}.{ext}.{version}_{write_token}
        if not file_name.startswith("."):
            raise ValueError(f"log file must start with '.': {file_name}")
        body = file_name[1:]
        file_id, _, rest = body.partition("_")
        middle, _, write_token = rest.rpartition("_")
        parts = middle.split(".")
        if len(parts) != 3:
            raise ValueError(f"bad log file name: {file_name}")
        ts, ext, version = parts
        if not all((file_id, ts, ext, version, write_token)):
            raise ValueError(f"bad log file name: {file_name}")
        return cls(file_id, ts, ext, int(version), write_token, file_name, size)

    def sort_key(self) -> tuple:
        return (self.timestamp, self.version, self.write_token)


@dataclass
class FileSlice:
    # None for a LOG-ONLY slice: a file group created by a deltacommit
    # that wrote only log files (no base yet — e.g. log-indexed inserts
    # before the first compaction). The reference does NOT support these
    # ("file slices without a base file are not yet supported",
    # docs/reader-spec.md §4); we read them by merging the logs against
    # an empty base.
    base_file: BaseFile | None
    partition_path: str
    log_files: list[LogFile] = field(default_factory=list)
    # slice key for a log-only slice: requested ts of the deltacommit
    # that created the group (unused when base_file is set)
    log_anchor_timestamp: str | None = None
    # populated ONLY when stats pruning loaded this slice's statistics
    # (MDT column_stats or a base-file footer read) — the reference
    # attaches these the same way ("only populated when data-column
    # filters trigger footer-based pruning", _internal.pyi:211-223):
    # {column: (min, max)} and the base file's record count
    column_stats: dict | None = field(default=None, compare=False)
    num_records: int | None = field(default=None, compare=False)

    @property
    def commit_timestamp(self) -> str:
        if self.base_file is not None:
            return self.base_file.commit_timestamp
        assert self.log_anchor_timestamp is not None
        return self.log_anchor_timestamp

    @property
    def file_id(self) -> str:
        if self.base_file is not None:
            return self.base_file.file_id
        return self.log_files[0].file_id

    def base_file_relative_path(self) -> str | None:
        if self.base_file is None:
            return None
        if self.partition_path:
            return f"{self.partition_path}/{self.base_file.file_name}"
        return self.base_file.file_name

    def log_file_relative_paths(self) -> list[str]:
        out = []
        for lf in sorted(self.log_files, key=LogFile.sort_key):
            if self.partition_path:
                out.append(f"{self.partition_path}/{lf.file_name}")
            else:
                out.append(lf.file_name)
        return out

    @property
    def has_log_files(self) -> bool:
        return bool(self.log_files)

    def total_size_bytes(self) -> int:
        """On-disk base + log sizes; files with unknown size contribute 0
        (reference FileSlice::total_size_bytes, docs/reader-spec.md §4 —
        log sizes included since they contribute to I/O cost)."""
        base = self.base_file.size if self.base_file is not None else 0
        return base + sum(lf.size for lf in self.log_files)


@dataclass
class FileGroup:
    file_id: str
    partition_path: str
    # commit_ts -> FileSlice, kept sorted on access (BTreeMap analog)
    slices: dict[str, FileSlice] = field(default_factory=dict)
    # instants of SCHEDULED (pending) compactions: a log whose embedded
    # ts is one of these anchors the slice AT that instant — it was
    # written against the compaction's future base, and must not attach
    # to the earlier slice the compaction supersedes
    compaction_anchors: frozenset = frozenset()

    def add_base_file(self, bf: BaseFile) -> None:
        # newer write_token for same commit wins (retried writes); a base
        # landing on a log-only slice's key (compaction scheduled at the
        # same instant) upgrades it in place, keeping the logs
        existing = self.slices.get(bf.commit_timestamp)
        if (
            existing is None
            or existing.base_file is None
            or bf.write_token > existing.base_file.write_token
        ):
            keep_logs = existing.log_files if existing else []
            self.slices[bf.commit_timestamp] = FileSlice(bf, self.partition_path, keep_logs)

    def add_log_file(self, lf: LogFile) -> None:
        """Associate by completion time (v8+) else by embedded base ts (v6):
        attach to the slice with the largest base commit_ts <= anchor
        (file_group/mod.rs:196-248). A log preceding every base slice
        starts a LOG-ONLY slice keyed at its embedded deltacommit ts —
        callers must feed logs in ascending anchor order so later logs of
        the same pre-compaction window attach to it instead of each
        spawning their own slice (fs_view.build_file_groups sorts)."""
        if lf.timestamp in self.compaction_anchors:
            # written against a scheduled compaction's future base:
            # start/join the slice keyed at EXACTLY that instant (when
            # the compaction commits, add_base_file upgrades it in place
            # keeping these logs)
            sl = self.slices.get(lf.timestamp)
            if sl is None:
                self.slices[lf.timestamp] = FileSlice(
                    None, self.partition_path, [lf],
                    log_anchor_timestamp=lf.timestamp,
                )
            else:
                sl.log_files.append(lf)
            return
        anchor = lf.completion_timestamp or lf.timestamp
        candidates = [ts for ts in self.slices if ts <= anchor]
        if not candidates:
            self.slices[lf.timestamp] = FileSlice(
                None, self.partition_path, [lf], log_anchor_timestamp=lf.timestamp
            )
            return
        self.slices[max(candidates)].log_files.append(lf)

    def get_file_slice_as_of(self, timestamp: str | None) -> FileSlice | None:
        """Max slice with commit_ts <= timestamp (mod.rs:261-281); None
        timestamp means latest."""
        keys = sorted(self.slices)
        if timestamp is not None:
            keys = [k for k in keys if k <= timestamp]
        return self.slices[keys[-1]] if keys else None
