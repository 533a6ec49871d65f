"""Synthesize minimal Lance v2 files for decoder branch coverage.

The reference fixtures exercise flat/no-null/binary/list pages but carry
no NULL values, so the nullable branches (all_nulls, some_nulls,
binary-with-adjustment) of ``lance/reader.py`` would otherwise ship
untested. This builder emits the same wire layout the reader documents:
protobuf column metadata with Any-wrapped ``lance.encodings
.ArrayEncoding`` pages, a FileDescriptor global buffer, offset tables,
and the 40-byte footer.
"""

from __future__ import annotations

import struct

ANY_URL = b"/lance.encodings.ArrayEncoding"


def _varint(n: int) -> bytes:
    if n < 0:
        n += 1 << 64  # protobuf encodes negatives as 64-bit two's complement
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _len_field(fno: int, payload: bytes) -> bytes:
    return _varint((fno << 3) | 2) + _varint(len(payload)) + payload


def _int_field(fno: int, value: int) -> bytes:
    return _varint(fno << 3) + _varint(value)


def flat_enc(bits: int, buffer_index: int) -> bytes:
    """ArrayEncoding{1: Flat{1: bits, 2: Buffer{1: index}}}"""
    flat = _int_field(1, bits) + _len_field(2, _int_field(1, buffer_index))
    return _len_field(1, flat)


def nullable_no_nulls(values_enc: bytes) -> bytes:
    return _len_field(2, _len_field(1, _len_field(1, values_enc)))


def nullable_all_nulls() -> bytes:
    return _len_field(2, _len_field(2, b""))


def nullable_some_nulls(validity_enc: bytes, values_enc: bytes) -> bytes:
    some = _len_field(1, validity_enc) + _len_field(2, values_enc)
    return _len_field(2, _len_field(3, some))


def binary_enc(index_enc: bytes, bytes_enc: bytes, adjustment: int) -> bytes:
    body = _len_field(1, index_enc) + _len_field(2, bytes_enc)
    if adjustment:
        body += _int_field(3, adjustment)
    return _len_field(6, body)


def _any_wrapped(encoding: bytes) -> bytes:
    """pm[4] = M{2: M{1: M{1: url, 2: encoding}}}"""
    inner = _len_field(1, ANY_URL) + _len_field(2, encoding)
    return _len_field(2, _len_field(1, inner))


def _field_msg(
    fid: int, parent: int, name: str, logical_type: str, nullable: bool
) -> bytes:
    return (
        _len_field(2, name.encode())
        + _int_field(3, fid)
        + _int_field(4, parent)
        + _len_field(5, logical_type.encode())
        + _int_field(6, 1 if nullable else 0)
    )


def build_lance_file(
    fields: list[tuple[str, str, bool]],
    column_pages: list[list[dict]],
) -> bytes:
    """``fields``: (name, logical_type, nullable) roots, pre-order with a
    list's child immediately following it (parent=-1 for roots, else the
    parent's index). For simplicity parents are all -1 here unless the
    name starts with '>' (child of previous field).

    ``column_pages``: one list per flattened field; each page dict has
    ``rows``, ``buffers`` (list of bytes, referenced by the encoding via
    page-local indexes 0..n-1), and ``encoding`` — ArrayEncoding bytes
    from the *_enc helpers.
    """
    out = bytearray()
    # data buffers first
    page_meta: list[list[tuple]] = []  # per column: (positions, sizes, rows, enc)
    for pages in column_pages:
        metas = []
        for page in pages:
            positions, sizes = [], []
            for buf in page["buffers"]:
                positions.append(len(out))
                sizes.append(len(buf))
                out.extend(buf)
            metas.append(
                (positions, sizes, page["rows"], page["encoding"])
            )
        page_meta.append(metas)

    # column metadatas
    col_meta_spans = []
    cm_start = len(out)
    for metas in page_meta:
        cm = b""
        for prio_base, (positions, sizes, rows, enc_bytes) in enumerate(metas):
            pm = (
                _len_field(1, b"".join(_varint(p) for p in positions))
                + _len_field(2, b"".join(_varint(s) for s in sizes))
                + _int_field(3, rows)
                + _len_field(4, _any_wrapped(enc_bytes))
                + _int_field(5, prio_base)
            )
            cm += _len_field(2, pm)
        col_meta_spans.append((len(out), len(cm)))
        out.extend(cm)

    # column metadata offset table
    cmo_start = len(out)
    for pos, size in col_meta_spans:
        out.extend(struct.pack("<QQ", pos, size))

    # global buffer 0: FileDescriptor{1: Schema{1: repeated Field}}
    flat_fields = b""
    prev_id = -1
    for i, (name, lt, nullable) in enumerate(fields):
        if name.startswith(">"):
            fm = _field_msg(i, prev_id, name[1:], lt, nullable)
        else:
            fm = _field_msg(i, -1, name, lt, nullable)
            prev_id = i
        flat_fields += _len_field(1, fm)
    descriptor = _len_field(1, flat_fields)
    gb_pos = len(out)
    out.extend(descriptor)

    gbo_start = len(out)
    out.extend(struct.pack("<QQ", gb_pos, len(descriptor)))

    out.extend(struct.pack("<QQQ", cm_start, cmo_start, gbo_start))
    out.extend(struct.pack("<IIHH", 1, len(fields), 0, 3))
    out.extend(b"LANC")
    return bytes(out)


def list_enc(offsets_enc: bytes, adjustment: int, num_items: int) -> bytes:
    """ArrayEncoding variant 4 (list): page-local cumulative end offsets
    + null adjustment + the page's child-item count."""
    body = _len_field(1, offsets_enc)
    if adjustment:
        body += _int_field(2, adjustment)
    body += _int_field(3, num_items)
    return _len_field(4, body)
