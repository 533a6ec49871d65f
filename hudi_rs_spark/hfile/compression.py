"""HFile block decompression codecs.

Codec ids follow /root/reference/crates/core/src/hfile/compression.rs:26-60
(lzo=0, gz=1, none=2, snappy=3, lz4=4, bzip2=5, zstd=6). The reference
implements gzip only and errors on snappy/lz4; Hudi writers commonly emit
snappy MDT HFiles, so we go further with pure-python snappy and lz4 block
decoders wrapped in the Hadoop BlockCompressorStream framing HBase uses:

    repeat:
      uncompressed-chunk-length (4B BE)
      repeat until that many bytes produced:
        compressed-piece-length (4B BE) + raw codec block

Driver-side only (MDT HFiles are small); no executor involvement.
"""

from __future__ import annotations

import struct
import zlib

CODEC_LZO, CODEC_GZ, CODEC_NONE, CODEC_SNAPPY, CODEC_LZ4 = 0, 1, 2, 3, 4

_NAMES = {0: "lzo", 1: "gz", 2: "none", 3: "snappy", 4: "lz4", 5: "bzip2", 6: "zstd"}


def decompress(codec: int, raw: bytes, uncompressed_size: int) -> bytes:
    """Decompress one block payload (checksums already stripped)."""
    if codec == CODEC_NONE:
        return raw
    if codec == CODEC_GZ:
        return zlib.decompress(raw, 16 + zlib.MAX_WBITS)
    if codec == CODEC_SNAPPY:
        return _hadoop_framed(raw, uncompressed_size, snappy_decompress_block)
    if codec == CODEC_LZ4:
        return _hadoop_framed(raw, uncompressed_size, lz4_decompress_block)
    name = _NAMES.get(codec, str(codec))
    raise ValueError(f"unsupported HFile compression codec {name!r} (id {codec})")


def _hadoop_framed(raw: bytes, uncompressed_size: int, block_fn) -> bytes:
    # Lengths come from the file and are signed: validate every one, or a
    # corrupt/adversarial block (negative piece length) would walk `pos`
    # backwards and spin the driver forever instead of raising.
    out = bytearray()
    pos, n = 0, len(raw)
    while pos < n and len(out) < uncompressed_size:
        if pos + 4 > n:
            raise ValueError("hadoop framing: truncated chunk header")
        (chunk_len,) = struct.unpack_from(">i", raw, pos)
        pos += 4
        if chunk_len < 0:
            raise ValueError(f"hadoop framing: negative chunk length {chunk_len}")
        produced = 0
        while produced < chunk_len:
            if pos + 4 > n:
                raise ValueError("hadoop framing: truncated piece header")
            (clen,) = struct.unpack_from(">i", raw, pos)
            pos += 4
            if clen <= 0 or clen > n - pos:
                raise ValueError(
                    f"hadoop framing: invalid compressed-piece length {clen} "
                    f"(remaining {n - pos})"
                )
            piece = block_fn(raw[pos : pos + clen])
            pos += clen  # clen > 0: forward progress guaranteed
            out += piece
            produced += len(piece)
    # A stream that ends (pos >= n) before yielding every expected byte —
    # e.g. truncated exactly at a chunk boundary — must fail HERE, not
    # resurface later as a confusing HFile parse error downstream.
    if len(out) != uncompressed_size:
        raise ValueError(
            f"hadoop framing: short output {len(out)} of "
            f"{uncompressed_size} expected bytes"
        )
    return bytes(out)


# ---------------------------------------------------------------------------
# raw snappy block format (format description: google/snappy format.txt)
# ---------------------------------------------------------------------------
def snappy_decompress_block(buf: bytes) -> bytes:
    n, pos, shift = 0, 0, 0
    while True:  # little-endian varint preamble: uncompressed length
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            break
    out = bytearray()
    end = len(buf)
    while pos < end:
        tag = buf[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                ln = int.from_bytes(buf[pos : pos + nb], "little")
                pos += nb
            ln += 1
            out += buf[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 1-byte offset
            ln = ((tag >> 2) & 0x7) + 4
            off = ((tag >> 5) << 8) | buf[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(buf[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy: invalid copy offset")
        start = len(out) - off
        for i in range(ln):  # may overlap: byte-at-a-time is the semantics
            out.append(out[start + i])
    if len(out) != n:
        raise ValueError(f"snappy: expected {n} bytes, produced {len(out)}")
    return bytes(out)


# ---------------------------------------------------------------------------
# raw lz4 block format (lz4 block format spec)
# ---------------------------------------------------------------------------
def lz4_decompress_block(buf: bytes) -> bytes:
    out = bytearray()
    pos, n = 0, len(buf)
    while pos < n:
        token = buf[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = buf[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        out += buf[pos : pos + lit]
        pos += lit
        if pos >= n:
            break  # last sequence carries literals only
        off = int.from_bytes(buf[pos : pos + 2], "little")
        pos += 2
        if off == 0 or off > len(out):
            raise ValueError("lz4: invalid match offset")
        mlen = token & 0xF
        if mlen == 15:
            while True:
                b = buf[pos]
                pos += 1
                mlen += b
                if b != 255:
                    break
        mlen += 4
        start = len(out) - off
        for i in range(mlen):
            out.append(out[start + i])
    return bytes(out)
