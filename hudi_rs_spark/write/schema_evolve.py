"""Write-side type-widening schema evolution.

Mirrors the reference's schema-resolution contract for the WRITE path:
the read side already resolves "latest commit schema wins, per-epoch
casts absorb physical drift" (``crates/core/src/schema/resolver.rs:41-114``,
exercised by tests/test_schema_evolution.py); the avro→arrow promotion
rules (``crates/core/src/schema.rs:63-150`` — int may promote to
long/float/double, long to float/double, float to double) define which
type CHANGES a commit may legally publish. This module applies the same
lattice before any file is written:

* incoming column NARROWER than the table's declared type → the frame
  is upcast to the table type (safe, no schema change published);
* incoming column WIDER along a legal promotion edge → the write
  proceeds with the wider type; the commit publishes the widened
  schema and old base files cast up per-epoch on read;
* any other top-level type change (string where the table has int,
  double where the table has long string, …) → rejected with
  :class:`SchemaEvolutionError` BEFORE any file lands — a narrowing or
  incompatible publish would corrupt every later snapshot.

Nested (struct/array/map) re-typing is not promoted — only exact
matches pass for nested types, same as the reference's resolver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class SchemaEvolutionError(ValueError):
    """An incoming frame's column type cannot evolve the table schema."""


# legal promotion edges, by Spark simpleString name (avro spec
# promotion set, plus the small-integer chain Spark itself widens
# implicitly). (frm, to) present => frm values are exactly
# representable (or avro-legal) as `to`.
_INT_CHAIN = ("tinyint", "smallint", "int", "bigint")
_FLOAT_CHAIN = ("float", "double")


def _widens(frm: str, to: str) -> bool:
    """True when ``frm`` may promote to ``to`` (strictly wider)."""
    if frm == to:
        return False
    if frm in _INT_CHAIN:
        if to in _INT_CHAIN:
            return _INT_CHAIN.index(frm) < _INT_CHAIN.index(to)
        return to in _FLOAT_CHAIN  # int family -> float/double (avro)
    if frm in _FLOAT_CHAIN and to in _FLOAT_CHAIN:
        return _FLOAT_CHAIN.index(frm) < _FLOAT_CHAIN.index(to)
    return False


def widest(a: T.DataType, b: T.DataType) -> T.DataType:
    """The wider of two types along the promotion lattice; ``a`` when
    they are equal or unrelated (caller decides how to treat the
    unrelated case)."""
    sa, sb = a.simpleString(), b.simpleString()
    return b if _widens(sa, sb) else a


def reconcile_frame(
    df: DataFrame, table_struct: T.StructType
) -> DataFrame:
    """Align an incoming write frame with the table's declared schema.

    Columns the frame shares with the table are compared by type:
    identical passes through, frame-narrower is upcast to the table
    type, frame-wider (legal promotion) passes through unchanged (the
    commit will publish the widened schema), anything else raises
    :class:`SchemaEvolutionError`. Frame-only columns (add-column
    evolution) and table-only columns (sparse upserts) pass through —
    commit-time schema union handles both.

    Driver-side column expressions only — the casts fuse into the
    write plan, no extra pass over the data.
    """
    table_types = {f.name: f.dataType for f in table_struct.fields}
    out = []
    changed = False
    problems: list[str] = []
    for f in df.schema.fields:
        want = table_types.get(f.name)
        if want is None or f.dataType == want:
            out.append(F.col(f.name))
            continue
        fs, ws = f.dataType.simpleString(), want.simpleString()
        if _widens(fs, ws):
            # frame narrower: upcast to the table's declared type
            out.append(F.col(f.name).cast(want).alias(f.name))
            changed = True
        elif _widens(ws, fs):
            # frame wider: legal promotion — this write widens the table
            out.append(F.col(f.name))
        else:
            problems.append(
                f"column {f.name!r}: table has {ws}, incoming frame has "
                f"{fs} — not a legal type promotion"
            )
    if problems:
        raise SchemaEvolutionError(
            "incompatible schema change rejected (no files written): "
            + "; ".join(problems)
        )
    return df.select(*out) if changed else df


def union_commit_schema(
    table_schema_json: dict, frame_schema_json: dict
) -> dict:
    """Commit-time published-schema union: table columns first (their
    ORDER authoritative), each at the WIDEST of (table, frame) declared
    avro type; frame-only columns appended (add-column evolution).
    Columns absent from the frame keep the table's field untouched — a
    sparse or tombstone frame can never NARROW the published schema.

    Operates on avro-JSON field dicts so it runs where commits are
    published (the DataSource worker, no SparkSession)."""
    # avro promotion uses avro primitive names; map them onto the same
    # lattice (avro int/long/float/double == spark int/bigint/float/
    # double)
    _AVRO2SPARK = {"int": "int", "long": "bigint",
                   "float": "float", "double": "double"}

    def _prim(field: dict) -> str | None:
        t = field.get("type")
        if isinstance(t, list):  # nullable union ["null", prim]
            t = next((x for x in t if x != "null"), None)
        return t if isinstance(t, str) else None

    frame_fields = {
        f.get("name"): f
        for f in frame_schema_json.get("fields", [])
        if isinstance(f, dict)
    }
    out_fields: list[dict] = []
    for tf in table_schema_json.get("fields", []):
        ff = frame_fields.get(tf.get("name"))
        if ff is None:
            out_fields.append(tf)
            continue
        tp, fp = _prim(tf), _prim(ff)
        if (
            tp in _AVRO2SPARK and fp in _AVRO2SPARK
            and _widens(_AVRO2SPARK[tp], _AVRO2SPARK[fp])
        ):
            out_fields.append(ff)  # frame widened this column
        else:
            out_fields.append(tf)  # table type stays authoritative
    have = {f.get("name") for f in out_fields}
    out_fields.extend(
        f for f in frame_schema_json.get("fields", [])
        if isinstance(f, dict) and f.get("name") not in have
    )
    return {**table_schema_json, "fields": out_fields}
