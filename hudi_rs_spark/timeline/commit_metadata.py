"""Commit metadata parsing (JSON for layout-1 / Avro OCF for layout-2
timelines) — behavior of
/root/reference/crates/core/src/timeline/mod.rs:333-386 (file groups from
commit metadata) and :302-320 (replaced file groups from replacecommits).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from hudi_rs_spark.avro.ocf import read_ocf_file


@dataclass
class WriteStat:
    file_id: str
    path: str
    partition_path: str


@dataclass
class CommitMetadata:
    write_stats: list[WriteStat] = field(default_factory=list)
    replaced_file_ids: dict[str, list[str]] = field(default_factory=dict)  # partition -> ids
    schema_json: str | None = None  # writer schema from "extraMetadata.schema"
    operation_type: str | None = None

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
                out.write_stats.append(
                    WriteStat(fid, path, s.get("partitionPath") or partition or "")
                )
    p2r = d.get("partitionToReplaceFileIds") or {}
    for partition, ids in p2r.items():
        out.replaced_file_ids[partition or ""] = list(ids or [])
    extra = d.get("extraMetadata") or {}
    out.schema_json = extra.get("schema") or None
    out.operation_type = d.get("operationType")
    return out


def parse_commit_file(path: str) -> CommitMetadata:
    """A commit file is either pretty-printed JSON (layout 1, v6) or an
    Avro object container file (layout 2, v8+); sniff the magic."""
    with open(path, "rb") as f:
        head = f.read(4)
    if head == b"Obj\x01":
        _, records = read_ocf_file(path)
        if not records:
            return CommitMetadata()
        return _from_dict(records[0])
    with open(path, "r", encoding="utf-8") as f:
        text = f.read()
    if not text.strip():
        return CommitMetadata()
    return _from_dict(json.loads(text))
