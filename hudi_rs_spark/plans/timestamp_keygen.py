"""Timestamp-based key generator: data-column filter -> partition-path
filter transform (op 17 extension).

Behavior of /root/reference/crates/core/src/keygen/timestamp_based.rs:
a filter on the timestamp source column becomes a filter on the derived
partition path string:

  = != IN NOT IN : parse value (per timestamp.type) -> format with the
                   output dateformat -> exact path compare
  < <= > >=      : only when the output format is lexicographically
                   sortable; Gt widens to Gte and Lt to Lte (partition
                   granularity is coarser than the value, so the boundary
                   partition must stay included)

Untransformable -> no pruning (fail-open, same as the reference
returning an empty transform).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone

from hudi_rs_spark.plans.partition_pruner import Filter

# java SimpleDateFormat -> strftime for the token subset Hudi uses
_JAVA_TOKENS = [
    ("yyyy", "%Y"),
    ("MM", "%m"),
    ("dd", "%d"),
    ("HH", "%H"),
    ("mm", "%M"),
    ("ss", "%S"),
]
_ORDERED = ["yyyy", "MM", "dd", "HH", "mm", "ss", "SSS"]


def _java_to_strftime(fmt: str) -> str:
    out = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "'":  # quoted literal
            j = fmt.index("'", i + 1)
            out.append(fmt[i + 1 : j] or "'")
            i = j + 1
            continue
        for tok, rep in _JAVA_TOKENS:
            if fmt.startswith(tok, i):
                out.append(rep)
                i += len(tok)
                break
        else:
            if fmt.startswith("SSS", i):
                out.append("%f")  # trimmed to millis post-format
                i += 3
            elif fmt[i] == "Z":
                out.append("%z")
                i += 1
            else:
                out.append(fmt[i])
                i += 1
    return "".join(out)


@dataclass
class TimestampKeyGen:
    source_field: str
    timestamp_type: str  # UNIX_TIMESTAMP | EPOCHMILLISECONDS | EPOCHMICROSECONDS | DATE_STRING | SCALAR
    output_format: str
    input_format: str | None = None
    hive_style: bool = False

    @classmethod
    def from_config(cls, config) -> "TimestampKeyGen | None":
        if config.key_generator_type.upper() not in ("TIMESTAMP", "TIMESTAMP_BASED") and \
           "TimestampBasedKeyGenerator" not in config.key_generator_type:
            return None
        fields = config.partition_fields
        if len(fields) != 1:
            return None
        p = config.props
        prefix = "hoodie.keygen.timebased."
        ttype = (p.get(prefix + "timestamp.type") or "").upper()
        out_fmt = p.get(prefix + "output.dateformat")
        if not ttype or not out_fmt:
            return None
        return cls(
            source_field=fields[0],
            timestamp_type=ttype,
            output_format=out_fmt,
            input_format=p.get(prefix + "input.dateformat"),
            hive_style=config.hive_style_partitioning,
        )

    # -- parsing -----------------------------------------------------------
    def parse_timestamp(self, value: str) -> datetime:
        t = self.timestamp_type
        if t == "UNIX_TIMESTAMP":
            return datetime.fromtimestamp(int(value), tz=timezone.utc)
        if t == "EPOCHMILLISECONDS":
            return datetime.fromtimestamp(int(value) / 1000.0, tz=timezone.utc)
        if t == "EPOCHMICROSECONDS":
            return datetime.fromtimestamp(int(value) / 1_000_000.0, tz=timezone.utc)
        if t in ("DATE_STRING", "MIXED"):
            if not self.input_format:
                raise ValueError("DATE_STRING keygen requires input.dateformat")
            fmt = _java_to_strftime(self.input_format)
            v = value
            if fmt.endswith("%z") and (v.endswith("Z") or v.endswith("z")):
                v = v[:-1] + "+0000"
            dt = datetime.strptime(v, fmt)
            return dt if dt.tzinfo else dt.replace(tzinfo=timezone.utc)
        if t == "SCALAR":
            return datetime.fromtimestamp(int(value), tz=timezone.utc)
        raise ValueError(f"unsupported timestamp type: {t}")

    def format_path(self, dt: datetime) -> str:
        fmt = _java_to_strftime(self.output_format)
        s = dt.astimezone(timezone.utc).strftime(fmt)
        if "%f" in fmt:  # java SSS is millis; strftime %f is micros
            s = s[:-3]
        if self.hive_style:
            s = f"{self.source_field}={s}"
        return s

    def is_lex_sortable(self) -> bool:
        """True iff output tokens appear in strictly decreasing date
        significance (then string compare == time compare)."""
        positions = []
        for tok in _ORDERED:
            idx = self.output_format.find(tok)
            if idx >= 0:
                positions.append((idx, _ORDERED.index(tok)))
        positions.sort()
        ranks = [r for _, r in positions]
        return ranks == sorted(ranks)

    # -- the transform -----------------------------------------------------
    def transform_filter(self, f: Filter) -> list[Filter]:
        """Returns path filters (field='__path__') or [] when pruning is
        not safely expressible."""
        if f.field != self.source_field:
            return [f]
        try:
            if f.op in ("=", "!="):
                path = self.format_path(self.parse_timestamp(f.value))
                return [Filter("__path__", f.op, path)]
            if f.op in ("IN", "NOT IN"):
                paths = [self.format_path(self.parse_timestamp(v)) for v in f.values()]
                return [Filter("__path__", f.op, ",".join(p.replace(",", "\\,") for p in paths))]
            if f.op in (">", ">=", "<", "<="):
                if not self.is_lex_sortable():
                    return []
                path = self.format_path(self.parse_timestamp(f.value))
                op = {">": ">=", "<": "<="}.get(f.op, f.op)
                return [Filter("__path__", op, path)]
        except (ValueError, KeyError):
            return []  # unparseable -> no pruning (fail-open)
        return []


def path_filter_matches(partition_path: str, f: Filter) -> bool:
    """Evaluate a '__path__' filter against the raw partition path string."""
    v = partition_path
    if f.op == "=":
        return v == f.value
    if f.op == "!=":
        return v != f.value
    if f.op == "IN":
        return v in set(f.values())
    if f.op == "NOT IN":
        return v not in set(f.values())
    if f.op == ">":
        return v > f.value
    if f.op == ">=":
        return v >= f.value
    if f.op == "<":
        return v < f.value
    if f.op == "<=":
        return v <= f.value
    return True


# ---------------------------------------------------------------------------
# WRITE-side twins (write/writer.py + write/upsert.py): derive the
# formatted partition value from the source column, vectorized in both
# engines — pyarrow kernels for the task writers, Catalyst expressions
# for tag joins. Same Java-format tokens as the read-side transform, so
# a table written here prunes through the transform above.
# ---------------------------------------------------------------------------
def keygen_from_write_config(cfg) -> "TimestampKeyGen | None":
    """TimestampKeyGen for an active write, or None when the write is
    not timestamp-keygen partitioned."""
    ttype = getattr(cfg, "keygen_timestamp_type", "") or ""
    out_fmt = getattr(cfg, "keygen_output_format", "") or ""
    if not ttype or not out_fmt:
        return None
    if len(cfg.partition_fields) != 1:
        raise ValueError(
            "timestamp keygen partitions on exactly ONE source field, "
            f"got {list(cfg.partition_fields)}"
        )
    if "SSS" in out_fmt:
        raise ValueError(
            "millisecond (SSS) output partition formats are unsupported "
            "on the write side — partition at second granularity or "
            "coarser"
        )
    return TimestampKeyGen(
        source_field=cfg.partition_fields[0],
        timestamp_type=ttype.upper(),
        output_format=out_fmt,
        input_format=getattr(cfg, "keygen_input_format", "") or None,
        hive_style=cfg.hive_style,
    )


def _arrow_timestamp(self, arr):
    import pyarrow as pa
    import pyarrow.compute as pc

    t = self.timestamp_type
    if t in ("UNIX_TIMESTAMP", "SCALAR"):
        return pc.cast(pc.cast(arr, pa.int64()), pa.timestamp("s"))
    if t == "EPOCHMILLISECONDS":
        return pc.cast(pc.cast(arr, pa.int64()), pa.timestamp("ms"))
    if t == "EPOCHMICROSECONDS":
        return pc.cast(pc.cast(arr, pa.int64()), pa.timestamp("us"))
    if t in ("DATE_STRING", "MIXED"):
        if not self.input_format:
            raise ValueError("DATE_STRING keygen requires input.dateformat")
        return pc.strptime(
            pc.cast(arr, pa.string()),
            format=_java_to_strftime(self.input_format),
            unit="us",
        )
    raise ValueError(f"unsupported timestamp type: {t}")


def _arrow_partition_values(self, arr):
    """Formatted partition value per row (no hive prefix, no default
    fill — the caller composes those like any other partition column)."""
    import pyarrow.compute as pc

    return pc.strftime(
        _arrow_timestamp(self, arr),
        format=_java_to_strftime(self.output_format),
    )


def _spark_partition_value(self):
    """Catalyst twin of arrow_partition_values — the upsert tag join
    derives the same formatted value JVM-side (session tz is UTC,
    matching the arrow/naive-UTC write path)."""
    from pyspark.sql import functions as F

    col = F.col(self.source_field)
    t = self.timestamp_type
    if t in ("UNIX_TIMESTAMP", "SCALAR"):
        ts = F.timestamp_seconds(col.cast("long"))
    elif t == "EPOCHMILLISECONDS":
        ts = F.timestamp_millis(col.cast("long"))
    elif t == "EPOCHMICROSECONDS":
        ts = F.timestamp_micros(col.cast("long"))
    elif t in ("DATE_STRING", "MIXED"):
        if not self.input_format:
            raise ValueError("DATE_STRING keygen requires input.dateformat")
        ts = F.to_timestamp(col.cast("string"), self.input_format)
    else:
        raise ValueError(f"unsupported timestamp type: {t}")
    return F.date_format(ts, self.output_format)


TimestampKeyGen.arrow_partition_values = _arrow_partition_values
TimestampKeyGen.spark_partition_value = _spark_partition_value
