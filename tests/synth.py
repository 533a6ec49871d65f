"""Synthesize minimal Hudi tables / log files for tests.

The reference ships golden fixtures for mainstream layouts; these helpers
cover scenarios the fixtures lack (cross-file rollback, out-of-order
incremental merges, CDC blocks, schema evolution, archived timelines).
Formats follow the public Hudi spec as re-expressed in
hudi_rs_spark/logfile/reader.py (log framing) and timeline/instant.py
(timeline file names).
"""

from __future__ import annotations

import io
import json
import os
import struct

import pyarrow as pa
import pyarrow.parquet as pq

from hudi_rs_spark.logfile.reader import (
    BLOCK_AVRO_DATA,
    BLOCK_CDC_DATA,
    BLOCK_COMMAND,
    BLOCK_PARQUET_DATA,
    KEY_COMMAND_BLOCK_TYPE,
    KEY_INSTANT_TIME,
    KEY_SCHEMA,
    KEY_TARGET_INSTANT_TIME,
    MAGIC,
)

META_COLS = (
    "_hoodie_commit_time",
    "_hoodie_commit_seqno",
    "_hoodie_record_key",
    "_hoodie_partition_path",
    "_hoodie_file_name",
)


# ---------------------------------------------------------------------------
# log-block framing (format version 1)
# ---------------------------------------------------------------------------
def _meta_map(entries: dict[int, str]) -> bytes:
    out = struct.pack(">I", len(entries))
    for k, v in entries.items():
        vb = v.encode("utf-8")
        out += struct.pack(">I", k) + struct.pack(">I", len(vb)) + vb
    return out


def frame_block(block_type: int, header: dict[int, str], content: bytes) -> bytes:
    body = (
        struct.pack(">I", 1)
        + struct.pack(">I", block_type)
        + _meta_map(header)
        + struct.pack(">Q", len(content))
        + content
        + _meta_map({})
    )
    total = 6 + 8 + len(body) + 8
    body += struct.pack(">Q", total)
    return MAGIC + struct.pack(">Q", len(body)) + body


def parquet_bytes(columns: dict) -> bytes:
    buf = io.BytesIO()
    pq.write_table(pa.table(columns), buf)
    return buf.getvalue()


def parquet_data_block(
    instant: str, columns: dict, extra_header: dict[int, str] | None = None
) -> bytes:
    header = {KEY_INSTANT_TIME: instant}
    if extra_header:
        header.update(extra_header)
    return frame_block(BLOCK_PARQUET_DATA, header, parquet_bytes(columns))


# ---------------------------------------------------------------------------
# minimal avro binary encoder (test-side twin of hudi_rs_spark/avro/binary.py;
# covers the primitives the synthesized blocks need)
# ---------------------------------------------------------------------------
def _zigzag(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def encode_datum(value, schema) -> bytes:
    if isinstance(schema, list):  # union: write branch index then value
        for i, branch in enumerate(schema):
            bname = branch if isinstance(branch, str) else branch.get("type")
            if value is None and bname == "null":
                return _zigzag(i)
            if value is not None and bname != "null":
                return _zigzag(i) + encode_datum(value, branch)
        raise ValueError(f"no union branch for {value!r}")
    stype = schema if isinstance(schema, str) else schema["type"]
    if stype == "null":
        return b""
    if stype in ("int", "long"):
        return _zigzag(int(value))
    if stype == "string":
        raw = value.encode("utf-8")
        return _zigzag(len(raw)) + raw
    if stype == "boolean":
        return b"\x01" if value else b"\x00"
    if stype == "double":
        return struct.pack("<d", float(value))
    if stype == "bytes":
        raw = bytes(value)
        return _zigzag(len(raw)) + raw
    if stype == "record":
        out = b""
        for f in schema["fields"]:
            out += encode_datum(value.get(f["name"]), f["type"])
        return out
    raise ValueError(f"unsupported avro type for encoder: {stype}")


def avro_data_block(
    instant: str, schema: dict, records: list[dict], block_type: int = BLOCK_AVRO_DATA
) -> bytes:
    """Avro data block: u32 block-version(3) + u32 count + per-record
    (u32 len + datum). CDC blocks (type 6) use the same serialization."""
    content = struct.pack(">I", 3) + struct.pack(">I", len(records))
    for r in records:
        datum = encode_datum(r, schema)
        content += struct.pack(">I", len(datum)) + datum
    header = {KEY_INSTANT_TIME: instant, KEY_SCHEMA: json.dumps(schema)}
    return frame_block(block_type, header, content)


def ocf_bytes(schema: dict, records: list[dict]) -> bytes:
    """Minimal avro Object Container File (null codec, one block)."""
    sync = b"\x07" * 16
    meta_entries = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": b"null",
    }
    out = b"Obj\x01" + _zigzag(len(meta_entries))
    for k, v in meta_entries.items():
        kb = k.encode()
        out += _zigzag(len(kb)) + kb + _zigzag(len(v)) + v
    out += _zigzag(0) + sync
    payload = b"".join(encode_datum(r, schema) for r in records)
    out += _zigzag(len(records)) + _zigzag(len(payload)) + payload + sync
    return out


# LSM timeline history record schema (public Hudi archived-timeline shape:
# instant identity + the original commit-file bytes as `metadata`)
LSM_HISTORY_SCHEMA = {
    "type": "record",
    "name": "HoodieLSMTimelineInstant",
    "fields": [
        {"name": "instantTime", "type": ["null", "string"], "default": None},
        {"name": "completionTime", "type": ["null", "string"], "default": None},
        {"name": "action", "type": ["null", "string"], "default": None},
        {"name": "metadata", "type": ["null", "bytes"], "default": None},
    ],
}


def write_lsm_history(
    history_dir: str, instants: list[tuple[str, str, str, bytes]]
) -> None:
    """instants: (instantTime, completionTime, action, commit_file_bytes).
    Writes _version_, manifest_{v}, and one compacted OCF history file
    (lsm_tree.rs:91-110 layout)."""
    os.makedirs(history_dir, exist_ok=True)
    records = [
        {"instantTime": ts, "completionTime": ct, "action": act, "metadata": meta}
        for ts, ct, act, meta in instants
    ]
    fname = f"{instants[0][0]}_{instants[-1][0]}_0.avro"
    data = ocf_bytes(LSM_HISTORY_SCHEMA, records)
    with open(os.path.join(history_dir, fname), "wb") as f:
        f.write(data)
    manifest = {
        "version": 1,
        "entries": [
            {
                "file_name": fname,
                "min_instant": instants[0][0],
                "max_instant": instants[-1][0],
                "level": 0,
                "file_size": len(data),
            }
        ],
    }
    with open(os.path.join(history_dir, "manifest_1"), "w") as f:
        json.dump(manifest, f)
    with open(os.path.join(history_dir, "_version_"), "w") as f:
        f.write("1")


CDC_SCHEMA = {
    "type": "record",
    "name": "HoodieCdcRecord",
    "fields": [
        {"name": "op", "type": ["null", "string"], "default": None},
        {"name": "ts_ms", "type": ["null", "string"], "default": None},
        {"name": "before", "type": ["null", "string"], "default": None},
        {"name": "after", "type": ["null", "string"], "default": None},
    ],
}


def cdc_block(instant: str, changes: list[dict]) -> bytes:
    return avro_data_block(instant, CDC_SCHEMA, changes, block_type=BLOCK_CDC_DATA)


def rollback_block(instant: str, target: str) -> bytes:
    return frame_block(
        BLOCK_COMMAND,
        {
            KEY_INSTANT_TIME: instant,
            KEY_TARGET_INSTANT_TIME: target,
            KEY_COMMAND_BLOCK_TYPE: "0",
        },
        b"",
    )


# ---------------------------------------------------------------------------
# minimal v6 MOR table
# ---------------------------------------------------------------------------
class SynthTable:
    """A non-partitioned v6 MERGE_ON_READ table built file-by-file.

    Usage:
        t = SynthTable(path, record_key="id", ordering="ts")
        t.write_base("g1-0", "20240101000000000", rows)
        t.append_log("g1-0", "20240101000000000",
                     parquet_data_block("20240102000000000", rows2))
        t.commit("20240101000000000")          # writes the .deltacommit
    """

    def __init__(
        self,
        base_path: str,
        record_key: str = "id",
        ordering: str = "ts",
        extra_props: dict[str, str] | None = None,
    ):
        self.base_path = base_path
        self.ordering = ordering
        hoodie = os.path.join(base_path, ".hoodie")
        os.makedirs(hoodie, exist_ok=True)
        props = {
            "hoodie.table.name": "synth",
            "hoodie.table.type": "MERGE_ON_READ",
            "hoodie.table.version": "6",
            "hoodie.timeline.layout.version": "1",
            "hoodie.table.recordkey.fields": record_key,
            "hoodie.table.precombine.field": ordering,
            "hoodie.populate.meta.fields": "true",
        }
        props.update(extra_props or {})
        with open(os.path.join(hoodie, "hoodie.properties"), "w") as f:
            f.write("\n".join(f"{k}={v}" for k, v in props.items()) + "\n")
        self._write_stats: dict[str, list[dict]] = {}  # instant -> stats
        self._props = props

    @property
    def timeline_dir(self) -> str:
        hoodie = os.path.join(self.base_path, ".hoodie")
        if (
            int(self._props.get("hoodie.timeline.layout.version", "1")) >= 2
            and self._props.get("hoodie.timeline.path")
        ):
            return os.path.join(hoodie, self._props["hoodie.timeline.path"])
        return hoodie

    def meta_columns(
        self, instant: str, keys: list[str], file_name: str, partition: str = ""
    ) -> dict:
        return {
            "_hoodie_commit_time": [instant] * len(keys),
            "_hoodie_commit_seqno": [f"{instant}_0_{i}" for i in range(len(keys))],
            "_hoodie_record_key": keys,
            "_hoodie_partition_path": [partition] * len(keys),
            "_hoodie_file_name": [file_name] * len(keys),
        }

    def write_base(
        self,
        file_id: str,
        instant: str,
        data: dict,
        keys: list[str],
        partition: str = "",
    ):
        """data: non-meta columns (must include the ordering field).
        ``partition``: relative partition dir ('' = non-partitioned)."""
        name = f"{file_id}_0-1-0_{instant}.parquet"
        rel = f"{partition}/{name}" if partition else name
        cols = self.meta_columns(instant, keys, name, partition)
        cols.update(data)
        full = os.path.join(self.base_path, rel)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        pq.write_table(pa.table(cols), full)
        self._write_stats.setdefault(instant, []).append(
            {"fileId": file_id, "path": rel, "partitionPath": partition}
        )
        return name

    def log_rows(self, instant: str, data: dict, keys: list[str], file_name: str) -> dict:
        cols = self.meta_columns(instant, keys, file_name)
        cols.update(data)
        return cols

    def append_log(
        self, file_id: str, base_instant: str, payload: bytes, version: int = 1,
        stats_instant: str | None = None,
    ) -> str:
        name = f".{file_id}_{base_instant}.log.{version}_0-1-0"
        path = os.path.join(self.base_path, name)
        mode = "ab" if os.path.exists(path) else "wb"
        with open(path, mode) as f:
            f.write(payload)
        if stats_instant:
            self._write_stats.setdefault(stats_instant, []).append(
                {"fileId": file_id, "path": name, "partitionPath": ""}
            )
        return name

    def commit_metadata_bytes(
        self,
        instant: str,
        schema: dict | None = None,
        replaced: dict[str, list[str]] | None = None,
    ) -> bytes:
        meta = {
            "partitionToWriteStats": {"": self._write_stats.get(instant, [])},
            "operationType": "UPSERT",
        }
        if replaced is not None:
            meta["partitionToReplaceFileIds"] = replaced
        if schema is not None:
            meta["extraMetadata"] = {"schema": json.dumps(schema)}
        return json.dumps(meta).encode()

    def commit(
        self,
        instant: str,
        action: str = "deltacommit",
        schema: dict | None = None,
        completion: str | None = None,
        replaced: dict[str, list[str]] | None = None,
    ):
        tdir = self.timeline_dir
        os.makedirs(tdir, exist_ok=True)
        if int(self._props.get("hoodie.timeline.layout.version", "1")) >= 2:
            name = f"{instant}_{completion or instant}.{action}"
        else:
            name = f"{instant}.{action}"
        with open(os.path.join(tdir, name), "wb") as f:
            f.write(self.commit_metadata_bytes(instant, schema, replaced))

    def archive_instant(self, instant: str, action: str = "deltacommit"):
        """Layout 1: park the completed commit file in the archive folder
        (the shape loader.rs:236-253 V1Archived lists)."""
        hoodie = os.path.join(self.base_path, ".hoodie")
        archive = os.path.join(
            hoodie, self._props.get("hoodie.archivelog.folder", "archived")
        )
        os.makedirs(archive, exist_ok=True)
        name = f"{instant}.{action}"
        os.replace(os.path.join(hoodie, name), os.path.join(archive, name))


def avro_schema(fields: list[tuple[str, str]]) -> dict:
    """Nullable-union avro record schema from (name, primitive-type)."""
    return {
        "type": "record",
        "name": "rec",
        "fields": [{"name": n, "type": ["null", t], "default": None} for n, t in fields],
    }
