"""Metadata-table ``record_index`` partition: record key -> file group
location, for point lookups that read ONE file slice instead of scanning
the table.

Beyond the reference's MDT scope (its read path uses only ``files``), but
the payload shape is the public HoodieMetadataRecord.recordIndexMetadata:
partitionName + the file id packed as UUID high/low bits + fileIndex
(fileIdEncoding 0) or a raw fileId string (encoding 1).

Scale story: a key lookup on a 100 TB table becomes O(record-index slice)
driver work + a single-file-group Spark scan, instead of a full-table
scan-and-filter.
"""

from __future__ import annotations

from hudi_rs_spark.avro.binary import Reader, collect_names, decode
from hudi_rs_spark.metadata.files_partition import iter_partition_hfiles

RECORD_INDEX_PARTITION = "record_index"


def _uuid_from_bits(high: int, low: int) -> str:
    val = ((high & 0xFFFFFFFFFFFFFFFF) << 64) | (low & 0xFFFFFFFFFFFFFFFF)
    h = f"{val:032x}"
    return f"{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"


def _file_id(ri: dict) -> str | None:
    enc = ri.get("fileIdEncoding", 0)
    if enc == 1:
        return ri.get("fileId") or None
    high, low = ri.get("fileIdHighBits"), ri.get("fileIdLowBits")
    if high is None or low is None:
        return None
    base = _uuid_from_bits(high, low)
    idx = ri.get("fileIndex")
    return f"{base}-{idx}" if idx is not None and idx >= 0 else base


def read_record_index(
    data_table_base_path: str,
    keys: set[str] | None = None,
    file_id: str | None = None,
) -> dict[str, tuple[str, str]]:
    """{record_key: (partition_path, file_id)}. With ``keys`` given, each
    index HFile answers through its block index (hfile/reader.py
    lookup_records — reference reader.rs:937 parity): only the blocks
    holding requested keys decompress, O(log blocks) per key, instead of
    a full index scan — the point of a point lookup on a 10^9-key index."""
    schema = names = None
    sorted_keys = sorted(keys) if keys is not None else None
    # Collect first, fold second. One commit can legitimately emit BOTH
    # a tombstone and an add for the same key from DIFFERENT writer
    # tasks (update.partition.path=true: the record moves — tombstone at
    # the old location, insert at the new one), landing as same-instant
    # same-version log-file twins whose filename order is task-schedule
    # dependent. A commit's index mutations are a SET: within one
    # instant, deletes must apply BEFORE adds so delete+add nets to the
    # add, deterministically. Across instants the instant order (later
    # commit wins) is the semantic order; base files (compacted merged
    # state) sort before every log instant.
    entries: list[tuple[str, int, int, str, tuple[str, str] | None]] = []
    seq = 0
    for is_base, hf, instant in iter_partition_hfiles(
        data_table_base_path, RECORD_INDEX_PARTITION, file_id=file_id,
        with_instants=True,
    ):
        if schema is None:
            schema = hf.avro_schema()
            if schema is None:
                raise ValueError("MDT record_index HFile carries no avro schema")
            names = collect_names(schema)
        if sorted_keys is not None:
            pairs = sorted(hf.lookup_records(sorted_keys).items())
        else:
            pairs = hf.records()
        order_instant = "" if is_base else (instant or "")
        for k, v in pairs:
            key = k.decode("utf-8", errors="replace")
            if keys is not None and key not in keys:
                continue
            loc: tuple[str, str] | None = None
            if v:
                d = decode(Reader(v), schema, names)
                ri = d.get("recordIndexMetadata")
                if ri is not None:
                    fid = _file_id(ri)
                    if fid:
                        loc = (ri.get("partitionName") or "", fid)
            entries.append((order_instant, loc is not None, seq, key, loc))
            seq += 1
    out: dict[str, tuple[str, str]] = {}
    for _, _, _, key, loc in sorted(entries, key=lambda e: e[:3]):
        if loc is None:
            out.pop(key, None)  # tombstone: key deleted
        else:
            out[key] = loc
    return out


def has_record_index_partition(config) -> bool:
    parts = config.props.get("hoodie.table.metadata.partitions", "")
    return RECORD_INDEX_PARTITION in [p.strip() for p in parts.split(",") if p.strip()]
