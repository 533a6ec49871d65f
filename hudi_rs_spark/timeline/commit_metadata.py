"""Commit metadata parsing (JSON for layout-1 / Avro OCF for layout-2
timelines) — behavior of
/root/reference/crates/core/src/timeline/mod.rs:333-386 (file groups from
commit metadata) and :302-320 (replaced file groups from replacecommits).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass
class WriteStat:
    file_id: str
    path: str
    partition_path: str
    # bytes this write produced (Hudi's fileSizeInBytes / totalWriteBytes;
    # 0 when the writer recorded neither) — feeds maxBytesPerTrigger
    # planning without any storage round-trip
    size: int = 0


@dataclass
class CommitMetadata:
    write_stats: list[WriteStat] = field(default_factory=list)
    replaced_file_ids: dict[str, list[str]] = field(default_factory=dict)  # partition -> ids
    schema_json: str | None = None  # writer schema from "extraMetadata.schema"
    operation_type: str | None = None
    raw: dict = field(default_factory=dict)  # full parsed metadata document

    @property
    def is_insert_overwrite(self) -> bool:
        return self.operation_type in ("INSERT_OVERWRITE", "INSERT_OVERWRITE_TABLE")


def _from_dict(d: dict) -> CommitMetadata:
    out = CommitMetadata()
    p2w = d.get("partitionToWriteStats") or {}
    for partition, stats in p2w.items():
        for s in stats or []:
            fid, path = s.get("fileId"), s.get("path")
            if fid and path:
                size = s.get("fileSizeInBytes") or s.get("totalWriteBytes") or 0
                try:
                    size = max(0, int(size))
                except (TypeError, ValueError):
                    size = 0
                out.write_stats.append(
                    WriteStat(
                        fid, path, s.get("partitionPath") or partition or "", size
                    )
                )
    p2r = d.get("partitionToReplaceFileIds") or {}
    for partition, ids in p2r.items():
        out.replaced_file_ids[partition or ""] = list(ids or [])
    extra = d.get("extraMetadata") or {}
    out.schema_json = extra.get("schema") or None
    out.operation_type = d.get("operationType")
    out.raw = d
    return out


def parse_commit_bytes(data: bytes) -> CommitMetadata:
    """Commit metadata from raw bytes: pretty-printed JSON (layout 1) or
    an Avro object container file (layout 2); sniff the magic. Also used
    for metadata payloads embedded in LSM history records."""
    if data[:4] == b"Obj\x01":
        from hudi_rs_spark.avro.ocf import read_ocf

        _, records = read_ocf(data)
        if not records:
            return CommitMetadata()
        return _from_dict(records[0])
    text = data.decode("utf-8")
    if not text.strip():
        return CommitMetadata()
    return _from_dict(json.loads(text))


def parse_commit_file(path: str) -> CommitMetadata:
    from hudi_rs_spark.fs.storage import storage_for

    return parse_commit_bytes(storage_for(path).read_bytes(path))
