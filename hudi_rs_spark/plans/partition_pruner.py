"""Driver-side partition pruning — behavior of
/root/reference/crates/core/src/table/partition.rs:96-270.

Parses a partition path (hive-style ``k=v`` or bare values, url-encoded,
multi-level) into typed scalars against the partition schema and
evaluates the pushed filters. Fail-open: a path that cannot be parsed is
KEPT (correctness over pruning).

This prunes before Spark ever sees the file list — strictly cheaper than
letting the scan discover-and-skip, and the pruned list is what bounds
planning cost at 100 TB (cost ∝ surviving partitions).
"""

from __future__ import annotations

from dataclasses import dataclass
from urllib.parse import unquote

OPS = ("=", "!=", "<", "<=", ">", ">=", "IN", "NOT IN")


@dataclass(frozen=True)
class Filter:
    field: str
    op: str
    value: str  # string form; split on unescaped commas for IN/NOT IN
    # IN/NOT IN value list carried typed (no serialize/strip round-trip):
    # string members with leading/trailing whitespace or embedded
    # escape-sensitive characters survive exactly. When set, values()
    # never touches `value`.
    typed: tuple | None = None

    def values(self) -> list[str]:
        if self.typed is not None:
            return [str(v) for v in self.typed]
        out, buf, i = [], [], 0
        v = self.value
        while i < len(v):
            # reader-spec §3: '\,' is a literal comma, '\\' a literal
            # backslash — so r'a\\,b' splits into ['a\', 'b']
            if v[i] == "\\" and i + 1 < len(v) and v[i + 1] in (",", "\\"):
                buf.append(v[i + 1])
                i += 2
                continue
            if v[i] == ",":
                out.append("".join(buf).strip())
                buf = []
                i += 1
                continue
            buf.append(v[i])
            i += 1
        out.append("".join(buf).strip())
        return out


def _coerce(raw: str, dtype: str):
    dtype = dtype.lower()
    if dtype in ("int", "integer", "bigint", "long", "smallint", "tinyint", "byte", "short"):
        return int(raw)
    if dtype in ("float", "double"):
        return float(raw)
    if dtype in ("boolean", "bool"):
        return raw.lower() == "true"
    return raw


class PartitionPruner:
    def __init__(
        self,
        partition_fields: list[tuple[str, str]],  # (name, spark-ddl type)
        filters: list[Filter],
        hive_style: bool,
        url_encoded: bool,
    ):
        self.partition_fields = partition_fields
        names = {f for f, _ in partition_fields}
        self.filters = [f for f in filters if f.field in names]
        self.hive_style = hive_style
        self.url_encoded = url_encoded

    @property
    def is_empty(self) -> bool:
        return not self.filters or not self.partition_fields

    def parse_path(self, partition_path: str) -> dict[str, object]:
        segments = partition_path.split("/") if partition_path else []
        if self.url_encoded:
            segments = [unquote(s) for s in segments]
        if len(segments) != len(self.partition_fields):
            raise ValueError(
                f"partition path '{partition_path}' does not match schema"
            )
        out: dict[str, object] = {}
        for (name, dtype), seg in zip(self.partition_fields, segments):
            if self.hive_style:
                k, eq, v = seg.partition("=")
                if not eq or k != name:
                    raise ValueError(f"bad hive-style segment '{seg}'")
                seg = v
            out[name] = _coerce(seg, dtype)
        return out

    def should_include(self, partition_path: str) -> bool:
        if self.is_empty:
            return True
        try:
            values = self.parse_path(partition_path)
        except (ValueError, KeyError):
            return True  # fail-open (partition.rs docstring behavior)
        dtypes = dict(self.partition_fields)
        for f in self.filters:
            v = values[f.field]
            try:
                if f.op in ("IN", "NOT IN"):
                    cmp_set = {_coerce(x, dtypes[f.field]) for x in f.values()}
                    hit = v in cmp_set
                    if (f.op == "IN") != hit:
                        return False
                else:
                    rhs = _coerce(f.value, dtypes[f.field])
                    ok = {
                        "=": v == rhs,
                        "!=": v != rhs,
                        "<": v < rhs,
                        "<=": v <= rhs,
                        ">": v > rhs,
                        ">=": v >= rhs,
                    }[f.op]
                    if not ok:
                        return False
            except (TypeError, ValueError):
                return True  # uncomparable -> keep
        return True
