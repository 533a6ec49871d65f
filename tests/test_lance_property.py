"""Property tests: random columns encoded with tests/synth_lance.py must
round-trip through BOTH lance decode paths (python fallback and Arrow
zero-copy) identically — nulls, empty strings, page splits, and value
extremes included."""

from __future__ import annotations

import struct

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from hudi_rs_spark.lance.reader import LanceFile, _arrow_type
from tests.synth_lance import (
    binary_enc,
    build_lance_file,
    flat_enc,
    nullable_all_nulls,
    nullable_no_nulls,
    nullable_some_nulls,
)

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


def _int64_page(values: list[int | None]) -> dict:
    rows = len(values)
    if all(v is None for v in values):
        return {"rows": rows, "buffers": [], "encoding": nullable_all_nulls()}
    payload = struct.pack(f"<{rows}q", *[v if v is not None else 0 for v in values])
    if any(v is None for v in values):
        bits = bytearray((rows + 7) // 8)
        for i, v in enumerate(values):
            if v is not None:
                bits[i >> 3] |= 1 << (i & 7)
        return {
            "rows": rows,
            "buffers": [bytes(bits), payload],
            "encoding": nullable_some_nulls(flat_enc(1, 0), flat_enc(64, 1)),
        }
    return {
        "rows": rows,
        "buffers": [payload],
        "encoding": nullable_no_nulls(flat_enc(64, 0)),
    }


def _string_page(values: list[str | None]) -> dict:
    rows = len(values)
    data = b"".join(v.encode() for v in values if v is not None)
    adjustment = len(data) + 1 if any(v is None for v in values) else 0
    ends, cum = [], 0
    for v in values:
        if v is None:
            ends.append(cum + adjustment)
        else:
            cum += len(v.encode())
            ends.append(cum)
    return {
        "rows": rows,
        "buffers": [struct.pack(f"<{rows}Q", *ends), data],
        "encoding": binary_enc(flat_enc(64, 0), flat_enc(8, 1), adjustment),
    }


def _decode_both(data: bytes) -> tuple[list, list]:
    lf = LanceFile(data)
    (fld,) = lf.fields
    slow = lf._field_values(fld, 0)
    fast = lf._field_array(fld, 0)
    assert fast is not None
    # fast must also match the declared arrow type
    typ = _arrow_type(fld)
    fast_arr = fast.combine_chunks()
    assert fast_arr.type == typ
    assert fast_arr == pa.array(slow, type=typ)
    return slow, fast_arr.to_pylist()


class TestInt64RoundTrip:
    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(st.one_of(st.none(), I64), min_size=1, max_size=40),
        st.integers(min_value=1, max_value=3),
    )
    def test_roundtrip_with_page_splits(self, values, n_pages):
        # split the column across up to n pages (uneven splits included)
        size = max(1, len(values) // n_pages)
        pages = [
            _int64_page(values[i : i + size])
            for i in range(0, len(values), size)
        ]
        data = build_lance_file([("c", "int64", True)], [pages])
        slow, fast = _decode_both(data)
        assert slow == values and fast == values


class TestStringRoundTrip:
    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.one_of(st.none(), st.text(max_size=12)),
            min_size=1,
            max_size=30,
        )
    )
    def test_roundtrip(self, values):
        data = build_lance_file(
            [("s", "string", True)], [[_string_page(values)]]
        )
        slow, fast = _decode_both(data)
        assert slow == values and fast == values


def _list_pages(values: list[list[int] | None], n_pages: int) -> tuple[list, list]:
    """Split a list<int64> column into n list pages + matching child
    pages (page-local end offsets, null adjustment, per-page num_items)."""
    from tests.synth_lance import list_enc

    size = max(1, len(values) // n_pages)
    list_pages, child_pages = [], []
    for i in range(0, len(values), size):
        chunk = values[i : i + size]
        items: list[int] = []
        ends, cum = [], 0
        for v in chunk:
            if v is not None:
                items.extend(v)
                cum += len(v)
            ends.append(cum)
        adjustment = cum + 1 if any(v is None for v in chunk) else 0
        stored = [
            e + adjustment if v is None else e for e, v in zip(ends, chunk)
        ]
        list_pages.append({
            "rows": len(chunk),
            "buffers": [struct.pack(f"<{len(chunk)}Q", *stored)],
            "encoding": list_enc(flat_enc(64, 0), adjustment, cum),
        })
        if items:
            child_pages.append({
                "rows": len(items),
                "buffers": [struct.pack(f"<{len(items)}q", *items)],
                "encoding": flat_enc(64, 0),
            })
    if not child_pages:  # child column must exist even if empty
        child_pages.append({
            "rows": 0, "buffers": [b""], "encoding": flat_enc(64, 0)
        })
    return list_pages, child_pages


class TestListRoundTrip:
    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.one_of(st.none(), st.lists(I64, max_size=5)),
            min_size=1,
            max_size=24,
        ),
        st.integers(min_value=1, max_value=3),
    )
    def test_roundtrip_with_page_splits(self, values, n_pages):
        list_pages, child_pages = _list_pages(values, n_pages)
        data = build_lance_file(
            [("L", "list", True), (">item", "int64", False)],
            [list_pages, child_pages],
        )
        slow, fast = _decode_both(data)
        assert slow == values and fast == values
