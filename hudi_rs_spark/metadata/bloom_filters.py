"""Metadata-table ``bloom_filters`` partition reader.

Reference spec: ``crates/core/src/metadata/table/records.rs:114-116``
(record type 4; the reference names the type but does not read it —
the blob format and key convention are this repo's, see
write/mdt_bloom.py). Per base file the value carries a serialized
bloom filter over the file's record keys; the upsert tag path uses it
to shrink the key→location index scan from ALL base files to the
files that plausibly contain the incoming keys (bloom false positives
cost one extra candidate scan; false negatives are impossible).

Merge: records iterate base→logs in commit order, so plain last-wins
per record key is the correct HoodieMetadataPayload fold; isDeleted
drops the entry (the file is then treated as "no bloom on record" by
callers — always a candidate, never wrong).
"""

from __future__ import annotations

from hudi_rs_spark.avro.binary import Reader, collect_names, decode
from hudi_rs_spark.metadata.files_partition import iter_partition_hfiles

BLOOM_FILTERS_PARTITION = "bloom_filters"


def has_bloom_filters_partition(config) -> bool:
    parts = config.props.get("hoodie.table.metadata.partitions", "")
    return BLOOM_FILTERS_PARTITION in [
        p.strip() for p in parts.split(",") if p.strip()
    ]


def read_bloom_filters(
    data_table_base_path: str,
    partition: str | None = None,
) -> dict[str, bytes]:
    """{file_name: bloom_blob} for live entries. ``partition`` narrows
    to one data partition via the composite-key prefix — on the folded
    (single-base-HFile) layout that is an indexed prefix read, not a
    full-partition decode."""
    prefix = None
    if partition is not None:
        prefix = f"{partition or '.'}:".encode()
    by_key: dict[str, tuple[str, bytes | None]] = {}
    schema = names = None
    for _is_base, hf in iter_partition_hfiles(
        data_table_base_path, BLOOM_FILTERS_PARTITION
    ):
        if schema is None:
            schema = hf.avro_schema()
            if schema is None:
                raise ValueError("MDT bloom_filters HFile carries no avro schema")
            names = collect_names(schema)
        cells = (
            hf.records_by_prefix(prefix) if prefix is not None else hf.records()
        )
        for k, v in cells:
            raw = k.decode("utf-8", errors="replace")
            if not v:
                continue
            d = decode(Reader(v), schema, names)
            bf = d.get("BloomFilterMetadata")
            if bf is None:
                continue
            fname = raw.split(":", 1)[1] if ":" in raw else raw
            if bf.get("isDeleted"):
                by_key[raw] = (fname, None)
            else:
                by_key[raw] = (fname, bf.get("bloomFilter"))
    return {
        fname: blob for fname, blob in by_key.values() if blob is not None
    }
