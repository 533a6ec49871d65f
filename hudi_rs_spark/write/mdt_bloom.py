"""Metadata-table ``bloom_filters`` partition records (type = 4).

Reference spec: ``crates/core/src/metadata/table/records.rs:114-116``
— "Bloom filter partition record (type = 4) … Key is a composite key,
value contains BloomFilterMetadata". The composite key here follows
this repo's column_stats convention: ``{partition or '.'}:{fileName}``
(the reader resolves by fileName, so the convention only needs to be
self-consistent and prefix-searchable by partition).

Value shape mirrors Hudi's HoodieMetadataBloomFilter avro
(type / timestamp / bloomFilter bytes / isDeleted); encoded by hand
like write/mdt_stats.py — avro binary is plain field concatenation,
and the hand encoder keeps reader and writer self-consistent without
the wrapper-type zoo.
"""

from __future__ import annotations

from hudi_rs_spark.write.logblocks import _zigzag

BLOOM_RECORD_SCHEMA = {
    "type": "record",
    "name": "HoodieMetadataRecord",
    "fields": [
        {"name": "key", "type": "string"},
        {"name": "type", "type": "int"},
        {
            "name": "BloomFilterMetadata",
            "type": [
                "null",
                {
                    "type": "record",
                    "name": "HoodieMetadataBloomFilter",
                    "fields": [
                        {"name": "type", "type": ["null", "string"],
                         "default": None},
                        {"name": "timestamp", "type": ["null", "string"],
                         "default": None},
                        {"name": "bloomFilter", "type": "bytes"},
                        {"name": "isDeleted", "type": "boolean"},
                    ],
                },
            ],
            "default": None,
        },
    ],
}


def _enc_string(v: str) -> bytes:
    raw = v.encode("utf-8")
    return _zigzag(len(raw)) + raw


def _enc_nullable_string(v: str | None) -> bytes:
    if v is None:
        return _zigzag(0)
    return _zigzag(1) + _enc_string(v)


def bloom_record_key(partition: str, file_name: str) -> str:
    return f"{partition or '.'}:{file_name}"


def encode_bloom_record(
    partition: str,
    file_name: str,
    instant: str,
    bloom_blob: bytes,
    bloom_type: str | None = None,
    is_deleted: bool = False,
) -> tuple[bytes, bytes]:
    """(key_bytes, value_bytes) for one bloom-filter record."""
    from hudi_rs_spark.bloomfilter import BLOOM_TYPE

    key = bloom_record_key(partition, file_name)
    out = _enc_string(key)
    out += _zigzag(4)  # MetadataRecordType::BloomFilters
    out += _zigzag(1)  # BloomFilterMetadata present
    out += _enc_nullable_string(bloom_type or BLOOM_TYPE)
    out += _enc_nullable_string(instant)
    out += _zigzag(len(bloom_blob)) + bloom_blob
    out += b"\x01" if is_deleted else b"\x00"
    return key.encode(), out
