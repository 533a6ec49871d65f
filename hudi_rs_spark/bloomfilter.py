"""Compact serialized bloom filter over record keys.

Backs the metadata-table ``bloom_filters`` partition (reference spec:
``crates/core/src/metadata/table/records.rs:114-116`` — record type 4,
composite key, BloomFilterMetadata value; the reference only *names*
the record type, so the filter blob format here is this repo's own).

Layout (little-endian): ``b"SBF1"`` magic, uint32 ``k`` (hash count),
uint64 ``m`` (bit count), then ``ceil(m/8)`` bytes of bit array.
Hashing is Kirsch–Mitzenmacher double hashing: one blake2b-16 digest
per key yields (h1, h2); probe ``i`` tests bit ``(h1 + i*h2) % m``.
blake2b is keyless and stable across processes — executors and the
driver always agree on membership (unlike salted ``hash()``).

Sizing: m = -n·ln(p)/ln(2)^2 capped at ``max_bits`` (1 MiB of bits by
default — a 4M-row base file at fpp=0.01 fits; beyond the cap fpp
degrades gracefully, and a bloom false positive only costs the tag
join one extra candidate file scan, never correctness).
"""

from __future__ import annotations

import hashlib
import math
import struct

_MAGIC = b"SBF1"
_HEADER = struct.Struct("<4sIQ")

#: advertised filter type in BloomFilterMetadata records
BLOOM_TYPE = "SIMPLE_BLAKE2B_V1"


def _hash_pair(key: str) -> tuple[int, int]:
    d = hashlib.blake2b(key.encode("utf-8"), digest_size=16).digest()
    h1, h2 = struct.unpack("<QQ", d)
    return h1, h2 | 1  # odd h2: full-period probing for power-of-two m


def build_bloom(
    keys, fpp: float = 0.01, max_bits: int = 1 << 23
) -> bytes:
    """Serialize a bloom filter containing every key in ``keys``."""
    key_list = [k if isinstance(k, str) else str(k) for k in keys]
    n = max(1, len(key_list))
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, min(m, max_bits))
    k = max(1, min(16, round(m / n * math.log(2))))
    bits = bytearray((m + 7) // 8)
    for key in key_list:
        h1, h2 = _hash_pair(key)
        for i in range(k):
            b = (h1 + i * h2) % m
            bits[b >> 3] |= 1 << (b & 7)
    return _HEADER.pack(_MAGIC, k, m) + bytes(bits)


def _parse(blob: bytes) -> tuple[int, int, bytes]:
    magic, k, m = _HEADER.unpack_from(blob)
    if magic != _MAGIC:
        raise ValueError("not a bloom filter blob (bad magic)")
    return k, m, blob[_HEADER.size :]


def bloom_contains(blob: bytes, key: str) -> bool:
    """Membership test: False is definitive, True may be a false
    positive (callers confirm against the actual file keys)."""
    k, m, bits = _parse(blob)
    h1, h2 = _hash_pair(key if isinstance(key, str) else str(key))
    for i in range(k):
        b = (h1 + i * h2) % m
        if not bits[b >> 3] & (1 << (b & 7)):
            return False
    return True


def candidates_for_keys(blooms: dict[str, bytes], keys) -> set[str]:
    """File names whose bloom may contain ANY of ``keys``. Each key is
    hashed once (digests shared across files), each blob parsed once —
    O(keys + files + probes), the shape the tag path needs."""
    hashed = [
        _hash_pair(k if isinstance(k, str) else str(k)) for k in set(keys)
    ]
    out: set[str] = set()
    for fname, blob in blooms.items():
        k, m, bits = _parse(blob)
        for h1, h2 in hashed:
            hit = True
            for i in range(k):
                b = (h1 + i * h2) % m
                if not bits[b >> 3] & (1 << (b & 7)):
                    hit = False
                    break
            if hit:
                out.add(fname)
                break
    return out


def bloom_contains_many(blob: bytes, keys) -> list[bool]:
    """Batch membership — one parse, early-exit per key."""
    k, m, bits = _parse(blob)
    out = []
    for key in keys:
        h1, h2 = _hash_pair(key if isinstance(key, str) else str(key))
        hit = True
        for i in range(k):
            b = (h1 + i * h2) % m
            if not bits[b >> 3] & (1 << (b & 7)):
                hit = False
                break
        out.append(hit)
    return out
