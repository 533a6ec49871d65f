"""Pure-Python reader for Lance v2 data files (file format version 2.0,
encoded as major=0/minor=3 in the footer) — the base-file format Hudi's
Lance integration writes one standalone file per base file of
(reference: crates/core/src/file_group/base_file/lance.rs:22-53, which
delegates to the `lance-file` crate; no Lance library exists in this
environment, so the format is re-derived here from the published Lance
file layout).

File layout (https://lancedb.github.io/lance file format v2):

    [data pages][column metadatas][column metadata offset table
    (pos,size per column)][global buffer offset table (pos,size)]
    [40-byte footer]

Footer: u64 column_meta_start, u64 column_meta_offsets_start,
u64 global_buff_offsets_start, u32 num_global_buffers, u32 num_columns,
u16 major, u16 minor, 4-byte magic "LANC".

Global buffer 0 holds a protobuf FileDescriptor: field 1 = Schema,
whose field 1 is the repeated flattened Field tree (pre-order; a
`list` field's single child follows it), each Field carrying
(2=name, 3=id, 4=parent_id, 5=logical_type, 6=nullable). One column of
page metadata per flattened field, in the same order.

Column metadata: field 1 = column encoding (ignored — always the
default), field 2 = repeated Page {1: packed buffer positions,
2: packed buffer sizes, 3: row count, 4: Encoding, 5: priority (row
offset of the page)}. Page encodings are protobuf-Any wrapped
`lance.encodings.ArrayEncoding`, a oneof of which Hudi's writer uses:

    1 flat      {1: bits_per_value, 2: buffer}       (1/32/64/128 bits)
    2 nullable  {1 no_nulls{1:values} | 2 all_nulls{} |
                 3 some_nulls{1:validity, 2:values}}
    4 list      {1: offsets encoding, 2: null_offset_adjustment,
                 3: num_items}
    6 binary    {1: index encoding, 2: bytes encoding,
                 3: null_adjustment}

Variable-width values (binary/string, and list offsets) store one
cumulative END offset per row; a null row's stored offset has the
null adjustment added, so `offset % adjustment` recovers the real
offset and `offset >= adjustment` flags the null — matching
lance-encodings' binary decoder.

Anything outside this closed set (dictionary, bitpacked, miniblock …)
raises loudly rather than mis-decoding.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import pyarrow as pa

MAGIC = b"LANC"


# ---------------------------------------------------------------------------
# minimal protobuf wire-format reader (no generated classes needed)
def _varint(buf: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _fields(buf: bytes) -> dict[int, list]:
    """field_number -> values (ints for varint/fixed, bytes for LEN)."""
    out: dict[int, list] = {}
    pos, end = 0, len(buf)
    while pos < end:
        tag, pos = _varint(buf, pos)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, pos = _varint(buf, pos)
        elif wt == 1:
            v = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
        elif wt == 2:
            ln, pos = _varint(buf, pos)
            v = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:
            v = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        else:
            raise ValueError(f"unsupported protobuf wire type {wt}")
        out.setdefault(fno, []).append(v)
    return out


def _packed_u64(buf: bytes) -> list[int]:
    out = []
    pos = 0
    while pos < len(buf):
        v, pos = _varint(buf, pos)
        out.append(v)
    return out


def _first(m: dict[int, list], fno: int, default=None):
    vs = m.get(fno)
    return vs[0] if vs else default


# ---------------------------------------------------------------------------
@dataclass
class _Field:
    fid: int
    parent: int
    name: str
    logical_type: str
    nullable: bool
    children: list["_Field"] = field(default_factory=list)


@dataclass
class _Page:
    buffers: list[tuple[int, int]]  # absolute (pos, size)
    rows: int
    priority: int
    encoding: dict[int, list]  # ArrayEncoding message fields


_FLAT_TYPES = {
    "int32": pa.int32(),
    "int64": pa.int64(),
    "double": pa.float64(),
    "float": pa.float32(),
    "bool": pa.bool_(),
}


def _arrow_type(f: _Field) -> pa.DataType:
    lt = f.logical_type
    if lt == "string":
        return pa.string()
    if lt == "binary":
        return pa.binary()
    if lt in _FLAT_TYPES:
        return _FLAT_TYPES[lt]
    if lt == "list":
        [child] = f.children
        return pa.list_(pa.field("element", _arrow_type(child), child.nullable))
    if lt.startswith("timestamp:"):
        # "timestamp:us:UTC" / "timestamp:us"
        parts = lt.split(":")
        tz = parts[2] if len(parts) > 2 and parts[2] else None
        return pa.timestamp(parts[1], tz=tz)
    if lt.startswith("date32"):
        return pa.date32()
    if lt.startswith("decimal:128:"):
        _, _, prec, scale = lt.split(":")
        return pa.decimal128(int(prec), int(scale))
    raise ValueError(f"unsupported lance logical type: {lt!r}")


class LanceFile:
    def __init__(self, data: bytes):
        if data[-4:] != MAGIC:
            raise ValueError("not a lance file (bad magic)")
        n = len(data)
        cm_start, cmo_start, gbo_start = struct.unpack("<QQQ", data[n - 40 : n - 16])
        ngb, ncol, major, minor = struct.unpack("<IIHH", data[n - 16 : n - 4])
        if (major, minor) != (0, 3):
            raise ValueError(
                f"unsupported lance file version {major}.{minor} (only 2.0)"
            )
        self._data = data
        self._mv = memoryview(data)  # zero-copy buffer views for fast path
        self._ncol = ncol
        # global buffer 0: FileDescriptor{1: Schema}
        pos, size = struct.unpack("<QQ", data[gbo_start : gbo_start + 16])
        descriptor = _fields(data[pos : pos + size])
        schema_msg = _fields(_first(descriptor, 1, b""))
        flat: list[_Field] = []
        for fb in schema_msg.get(1, []):
            fm = _fields(fb)
            parent = _first(fm, 4, 0)
            if parent >= 2**63:
                parent -= 2**64
            flat.append(
                _Field(
                    fid=_first(fm, 3, 0),
                    parent=parent,
                    name=_first(fm, 2, b"").decode(),
                    logical_type=_first(fm, 5, b"").decode(),
                    nullable=bool(_first(fm, 6, 0)),
                )
            )
        by_id = {f.fid: f for f in flat}
        self.fields: list[_Field] = []  # roots, serialized order
        for f in flat:
            if f.parent < 0:
                self.fields.append(f)
            else:
                by_id[f.parent].children.append(f)
        self._flat_fields = flat  # one column per flattened field
        # column metadatas
        self._pages: list[list[_Page]] = []
        for i in range(ncol):
            cpos, csize = struct.unpack(
                "<QQ", data[cmo_start + 16 * i : cmo_start + 16 * i + 16]
            )
            cm = _fields(data[cpos : cpos + csize])
            pages = []
            for pb in cm.get(2, []):
                pm = _fields(pb)
                offs = _packed_u64(_first(pm, 1, b""))
                sizes = _packed_u64(_first(pm, 2, b""))
                any_msg = _fields(_first(_fields(_first(pm, 4, b"")), 2, b""))
                wrapped = _fields(_first(any_msg, 1, b""))
                url = _first(wrapped, 1, b"").decode()
                if url != "/lance.encodings.ArrayEncoding":
                    raise ValueError(f"unsupported page encoding {url!r}")
                pages.append(
                    _Page(
                        buffers=list(zip(offs, sizes)),
                        rows=_first(pm, 3, 0),
                        priority=_first(pm, 5, 0),
                        encoding=_fields(_first(wrapped, 2, b"")),
                    )
                )
            pages.sort(key=lambda p: p.priority)
            self._pages.append(pages)

    @classmethod
    def from_path(cls, path: str, storage_options: dict | None = None) -> "LanceFile":
        from hudi_rs_spark.fs.storage import storage_for

        return cls(storage_for(path, storage_options).read_bytes(path))

    @staticmethod
    def num_rows_from_path(path: str, storage_options: dict | None = None) -> int:
        """Row count from THREE small ranged reads (footer, column-0
        metadata offset entry, column-0 metadata) — never the whole
        object. Table-stats estimation uses this the way the parquet
        path reads only the footer; a full-file GET for num_rows would
        be a multi-GB download at scale."""
        from hudi_rs_spark.fs.storage import storage_for

        st = storage_for(path, storage_options)
        with st.open_seekable(path) as f:
            f.seek(-40, 2)
            footer = f.read(40)
            if footer[-4:] != MAGIC:
                raise ValueError("not a lance file (bad magic)")
            _cm, cmo_start, _gbo = struct.unpack("<QQQ", footer[:24])
            _ngb, ncol, major, minor = struct.unpack("<IIHH", footer[24:36])
            if (major, minor) != (0, 3):
                raise ValueError(
                    f"unsupported lance file version {major}.{minor}"
                )
            if ncol == 0:
                return 0
            f.seek(cmo_start)
            pos, size = struct.unpack("<QQ", f.read(16))
            f.seek(pos)
            cm = _fields(f.read(size))
        return sum(_first(_fields(pb), 3, 0) for pb in cm.get(2, []))

    # ------------------------------------------------------------------
    def arrow_schema(self) -> pa.Schema:
        return pa.schema(
            [pa.field(f.name, _arrow_type(f), f.nullable) for f in self.fields]
        )

    @property
    def num_rows(self) -> int:
        return sum(p.rows for p in self._pages[0]) if self._pages else 0

    def to_table(self, columns: list[str] | None = None) -> pa.Table:
        # map root field -> starting flattened column index
        col_idx: dict[int, int] = {}
        i = 0
        for f in self._flat_fields:
            col_idx[id(f)] = i
            i += 1
        names, arrays = [], []
        for f in self.fields:
            if columns is not None and f.name not in columns:
                continue
            names.append(f.name)
            arrays.append(self._read_field(f, col_idx[id(f)]))
        if columns is not None:  # caller order
            order = {n: k for k, n in enumerate(columns)}
            pairs = sorted(zip(names, arrays), key=lambda p: order[p[0]])
            names = [p[0] for p in pairs]
            arrays = [p[1] for p in pairs]
        if not names:  # count-only projections: keep num_rows, zero cols
            return pa.table({"__dummy": pa.nulls(self.num_rows)}).drop_columns(
                ["__dummy"]
            )
        return pa.table(dict(zip(names, arrays)))

    # ------------------------------------------------------------------
    def _read_field(self, f: _Field, col: int):
        """Arrow zero-copy fast path first (buffers wrapped in place, no
        per-value python objects — the difference between milliseconds
        and minutes on multi-GB base files); the per-value python
        decoder stays the authoritative fallback for any page shape the
        fast path doesn't cover. ``tests/test_lance.py`` asserts both
        paths agree on every column of every fixture."""
        fast = self._field_array(f, col)
        if fast is not None:
            return fast
        return pa.array(self._field_values(f, col), type=_arrow_type(f))

    # -- Arrow fast path ------------------------------------------------
    def _field_array(self, f: _Field, col: int):
        """pa.ChunkedArray for the column, or None when any page needs
        the fallback decoder."""
        typ = _arrow_type(f)
        if f.logical_type == "list":
            return self._list_array(f, col, typ)
        chunks = []
        for page in self._pages[col]:
            arr = self._page_array(f, page, typ)
            if arr is None:
                return None
            chunks.append(arr)
        if not chunks:
            return pa.chunked_array([], type=typ)
        return pa.chunked_array(chunks)

    _FIXED_BITS = {
        "int32": 32, "int64": 64, "float": 32, "double": 64, "bool": 1,
    }

    def _flat_array(self, f: _Field, page: _Page, flat_msg: dict, typ, validity=None):
        """pa.Array straight from a flat page buffer (zero copy)."""
        bits = _first(flat_msg, 1, 0)
        lt = f.logical_type
        expect = self._FIXED_BITS.get(lt)
        if expect is None:
            if lt.startswith("timestamp:") or lt == "int64":
                expect = 64
            elif lt.startswith("date32"):
                expect = 32
            elif lt.startswith("decimal:128:"):
                expect = 128
            else:
                return None
        if bits != expect:
            return None
        return pa.Array.from_buffers(
            typ,
            page.rows,
            [validity, self._pa_buffer(page, flat_msg)],
            null_count=-1 if validity else 0,
        )

    def _validity_buffer(self, page: _Page, enc: dict):
        """Arrow validity bitmap from a 1-bit flat validity encoding —
        lance packs bits LSB-first exactly like Arrow, so the buffer is
        usable as-is."""
        flat = self._unwrap_to_flat(enc)
        if _first(flat, 1, 0) != 1:
            return None
        return self._pa_buffer(page, flat)

    def _page_array(self, f: _Field, page: _Page, typ):
        enc = page.encoding
        if 1 in enc:  # bare flat
            return self._flat_array(f, page, _fields(enc[1][0]), typ)
        if 2 in enc:  # nullable wrapper
            m = _fields(enc[2][0])
            if 1 in m:  # no_nulls
                inner = _fields(_first(_fields(m[1][0]), 1, b""))
                if 1 not in inner:
                    return None
                return self._flat_array(f, page, _fields(inner[1][0]), typ)
            if 2 in m:  # all_nulls
                return pa.nulls(page.rows, typ)
            if 3 in m:  # some_nulls { 1: validity, 2: values }
                sm = _fields(m[3][0])
                validity = self._validity_buffer(
                    page, _fields(_first(sm, 1, b""))
                )
                values_enc = _fields(_first(sm, 2, b""))
                if validity is None or 1 not in values_enc:
                    return None
                return self._flat_array(
                    f, page, _fields(values_enc[1][0]), typ, validity=validity
                )
            return None
        if 6 in enc:  # binary / string
            return self._binary_array(f, page, _fields(enc[6][0]), typ)
        return None

    def _binary_array(self, f: _Field, page: _Page, m: dict, typ):
        import numpy as np

        ends, nulls = self._offsets_np(
            page, _fields(_first(m, 1, b"")), page.rows, _first(m, 3, 0)
        )
        data = self._pa_buffer(
            page, self._unwrap_to_flat(_fields(_first(m, 2, b"")))
        )
        offsets = np.empty(page.rows + 1, dtype=np.int64)
        offsets[0] = 0
        offsets[1:] = ends
        validity = None
        null_count = 0
        if nulls.any():
            bits = np.packbits(~nulls, bitorder="little")
            validity = pa.py_buffer(bits.tobytes())
            null_count = int(nulls.sum())
        large = pa.Array.from_buffers(
            pa.large_string() if typ == pa.string() else pa.large_binary(),
            page.rows,
            [validity, pa.py_buffer(offsets.tobytes()), data],
            null_count=null_count,
        )
        return large.cast(typ)

    def _list_array(self, f: _Field, col: int, typ):
        [child] = f.children
        child_arr = self._field_array(child, self._child_col_index(f))
        if child_arr is None:
            return None
        child_comb = child_arr.combine_chunks()
        chunks = []
        base = 0
        for page in self._pages[col]:
            enc = page.encoding
            if 4 not in enc:
                return None
            m = _fields(enc[4][0])
            ends, nulls = self._offsets(
                page, _fields(_first(m, 1, b"")), page.rows, _first(m, 2, 0)
            )
            n_items = ends[-1] if ends else 0
            # pa.ListArray.from_arrays marks null the element STARTING at
            # a null offset, so nulls flag row i's start offset
            # (ends[i-1]); a null row consumes no child items, so its
            # neighbors' extents stay correct. Flagging the END offset
            # instead shifts every null one row later — caught by the
            # synthetic multi-page list test.
            starts = [0] + ends[:-1]
            offs = [
                None if null else s for s, null in zip(starts, nulls)
            ] + [n_items]
            chunk = pa.ListArray.from_arrays(
                pa.array(offs, type=pa.int32()),
                child_comb.slice(base, n_items),
            )
            chunks.append(chunk.cast(typ))
            base += _first(m, 3, 0) or n_items
        if base != len(child_comb):
            raise ValueError(
                f"list column consumed {base} child rows of {len(child_comb)}"
            )
        if not chunks:
            return pa.chunked_array([], type=typ)
        return pa.chunked_array(chunks)

    def _field_values(self, f: _Field, col: int) -> list:
        """All pages of one flattened column as python values. Lists are
        handled at FIELD level (not per page) because list-page offsets
        are page-local while the child column's values are global: each
        list page slices the child at a running base offset."""
        if f.logical_type == "list":
            return self._list_values(f, col)
        values: list = []
        for page in self._pages[col]:
            values.extend(self._decode_page(f, page))
        return values

    def _list_values(self, f: _Field, col: int) -> list:
        [child] = f.children
        # child column immediately follows the list column; decode it
        # ONCE across all its pages (recursively — nested lists fine)
        child_vals = self._field_values(child, self._child_col_index(f))
        out: list = []
        base = 0  # running child-row offset across list pages
        for page in self._pages[col]:
            enc = page.encoding
            if 4 not in enc:
                raise ValueError("expected list page encoding")
            m = _fields(enc[4][0])
            ends, nulls = self._offsets(
                page, _fields(_first(m, 1, b"")), page.rows, _first(m, 2, 0)
            )
            prev = 0
            for e, null in zip(ends, nulls):
                out.append(None if null else child_vals[base + prev : base + e])
                prev = e
            num_items = _first(m, 3, 0)
            if num_items and num_items != prev:
                raise ValueError(
                    f"list page item count mismatch: offsets end at {prev}, "
                    f"page declares num_items={num_items}"
                )
            base += num_items or prev
        if base != len(child_vals):
            raise ValueError(
                f"list column consumed {base} child rows of {len(child_vals)}"
            )
        return out

    def _decode_page(self, f: _Field, page: _Page) -> list:
        enc = page.encoding
        [(variant, [v])] = [(k, enc[k]) for k in sorted(enc)][:1] or [(None, [b""])]
        if variant == 2:  # nullable wrapper
            return self._decode_nullable(f, page, _fields(v))
        if variant == 6:  # binary / string
            return self._decode_binary(f, page, _fields(v))
        if variant == 4:  # list — must go through _list_values
            raise ValueError(
                "list pages are decoded at field level (_list_values), "
                "not per page"
            )
        if variant == 1:  # bare flat
            return self._decode_flat(f, page, _fields(v), page.rows)
        raise ValueError(f"unsupported ArrayEncoding variant {variant}")

    def _decode_nullable(self, f: _Field, page: _Page, m: dict) -> list:
        if 1 in m:  # no_nulls { 1: values }
            inner = _fields(_first(_fields(m[1][0]), 1, b""))
            if 1 not in inner:
                raise ValueError("nullable.no_nulls without flat values")
            return self._decode_flat(f, page, _fields(inner[1][0]), page.rows)
        if 2 in m:  # all_nulls
            return [None] * page.rows
        if 3 in m:  # some_nulls { 1: validity, 2: values }
            sm = _fields(m[3][0])
            validity_enc = _fields(_first(_fields(_first(sm, 1, b"")), 1, b""))
            values_enc = _fields(_first(_fields(_first(sm, 2, b"")), 1, b""))
            bits = self._decode_flat_raw(1, validity_enc, page, page.rows)
            vals = self._decode_flat(f, page, values_enc, page.rows)
            return [v if ok else None for ok, v in zip(bits, vals)]
        raise ValueError("unknown nullable variant")

    def _buffer_span(self, page: _Page, flat_msg: dict) -> tuple[int, int]:
        """(pos, size) of the flat encoding's data buffer."""
        buf_msg = _fields(_first(flat_msg, 2, b""))
        return page.buffers[_first(buf_msg, 1, 0)]

    def _buffer(self, page: _Page, flat_msg: dict) -> bytes:
        pos, size = self._buffer_span(page, flat_msg)
        return self._data[pos : pos + size]

    def _pa_buffer(self, page: _Page, flat_msg: dict):
        """Zero-copy pyarrow buffer over the file bytes (a bytes slice
        would copy; the memoryview wraps in place)."""
        pos, size = self._buffer_span(page, flat_msg)
        return pa.py_buffer(self._mv[pos : pos + size])

    def _decode_flat_raw(self, bits: int, flat_msg: dict, page: _Page, rows: int):
        raw = self._buffer(page, flat_msg)
        if bits == 1:
            return [(raw[i >> 3] >> (i & 7)) & 1 == 1 for i in range(rows)]
        width = bits // 8
        return [raw[i * width : (i + 1) * width] for i in range(rows)]

    def _decode_flat(self, f: _Field, page: _Page, flat_msg: dict, rows: int) -> list:
        bits = _first(flat_msg, 1, 0)
        lt = f.logical_type
        raw = self._buffer(page, flat_msg)
        if lt == "bool":
            if bits != 1:
                raise ValueError(f"bool with {bits} bits")
            return [(raw[i >> 3] >> (i & 7)) & 1 == 1 for i in range(rows)]
        if bits == 32 and lt == "int32":
            return list(struct.unpack(f"<{rows}i", raw[: 4 * rows]))
        if bits == 32 and lt.startswith("date32"):
            return list(struct.unpack(f"<{rows}i", raw[: 4 * rows]))
        if bits == 32 and lt == "float":
            return list(struct.unpack(f"<{rows}f", raw[: 4 * rows]))
        if bits == 64 and lt == "double":
            return list(struct.unpack(f"<{rows}d", raw[: 8 * rows]))
        if bits == 64 and (lt == "int64" or lt.startswith("timestamp:")):
            return list(struct.unpack(f"<{rows}q", raw[: 8 * rows]))
        if bits == 128 and lt.startswith("decimal:128:"):
            import decimal

            scale = int(lt.split(":")[3])
            out = []
            for i in range(rows):
                unscaled = int.from_bytes(
                    raw[16 * i : 16 * (i + 1)], "little", signed=True
                )
                out.append(
                    decimal.Decimal(unscaled).scaleb(-scale)
                )
            return out
        raise ValueError(f"unsupported flat decode: {bits} bits as {lt!r}")

    def _offsets_np(self, page: _Page, enc: dict, rows: int, adjustment: int):
        """Cumulative end offsets + null flags (numpy arrays) from a
        (possibly nullable-wrapped) flat u64/u32 index/offsets
        ArrayEncoding — the ONE offset decoder shared by binary and list
        pages. A null row's stored offset has ``adjustment`` added;
        modulo recovers the real end (lance-encodings binary decoder
        semantics)."""
        import numpy as np

        flat = self._unwrap_to_flat(enc)
        bits = _first(flat, 1, 0)
        pos, _size = self._buffer_span(page, flat)
        if bits == 64:
            ends = np.frombuffer(self._mv[pos : pos + 8 * rows], dtype="<u8")
        elif bits == 32:
            ends = np.frombuffer(self._mv[pos : pos + 4 * rows], dtype="<u4")
        else:
            raise ValueError(f"unsupported offset width {bits}")
        if adjustment > 0:
            nulls = ends >= adjustment
            ends = ends % adjustment
        else:
            nulls = np.zeros(rows, dtype=bool)
        return ends.astype(np.int64), nulls

    def _offsets(self, page: _Page, enc: dict, rows: int, adjustment: int):
        """List-typed view of ``_offsets_np`` for the python fallback."""
        ends, nulls = self._offsets_np(page, enc, rows, adjustment)
        return ends.tolist(), nulls.tolist()

    def _unwrap_to_flat(self, enc: dict) -> dict:
        """ArrayEncoding -> flat message, seeing through nullable."""
        if 1 in enc:
            return _fields(enc[1][0])
        if 2 in enc:
            nm = _fields(enc[2][0])
            if 1 in nm:  # no_nulls{1: values(ArrayEncoding)}
                inner = _fields(_first(_fields(nm[1][0]), 1, b""))
                return self._unwrap_to_flat(inner)
        raise ValueError("expected flat(-wrapped) encoding")

    def _decode_binary(self, f: _Field, page: _Page, m: dict) -> list:
        ends, nulls = self._offsets(
            page, _fields(_first(m, 1, b"")), page.rows, _first(m, 3, 0)
        )
        data = self._buffer(page, self._unwrap_to_flat(_fields(_first(m, 2, b""))))
        out: list = []
        prev = 0
        as_str = f.logical_type == "string"
        for e, null in zip(ends, nulls):
            if null:
                out.append(None)
            else:
                chunk = data[prev:e]
                out.append(chunk.decode() if as_str else chunk)
            prev = e
        return out

    def _child_col_index(self, f: _Field) -> int:
        for i, ff in enumerate(self._flat_fields):
            if ff is f:
                return i + 1
        raise ValueError(f"field {f.name} not found")
