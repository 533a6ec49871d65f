"""Timestamp parsing / normalization — behavior of
/root/reference/crates/core/src/timeline/util.rs (format_timestamp) and
docs/reader-spec.md:311-319.

Accepted inputs for as-of / incremental bounds:
  - hudi timeline format yyyyMMddHHmmss / yyyyMMddHHmmssSSS
  - epoch seconds / millis / micros / nanos (magnitude-disambiguated)
  - RFC3339 WITH offset ("2024-04-02T12:30:35.233+00:00", trailing 'Z')
  - naive datetime strings are REJECTED (ambiguous without a timezone)

Everything normalizes to the 17-char hudi form rendered in the table's
timeline timezone (hoodie.table.timeline.timezone: "UTC" default, "LOCAL"
= system zone, or an IANA name); already-timeline-format inputs pass
through untouched since they are by definition in that zone.
"""

from __future__ import annotations

from datetime import datetime, timezone, tzinfo

_EPOCH_RANGES = (
    # (min_digits, max_digits, scale_to_millis)
    (19, 20, 1_000_000),  # nanos
    (16, 17, 1_000),  # micros
    (13, 14, 1),  # millis
    (9, 11, 0.001),  # seconds (late-2001 .. 2100+)
)


def _resolve_zone(timezone_name: str) -> tzinfo:
    name = (timezone_name or "UTC").strip()
    if name.upper() == "UTC":
        return timezone.utc
    if name.upper() == "LOCAL":
        local = datetime.now().astimezone().tzinfo
        return local if local is not None else timezone.utc
    from zoneinfo import ZoneInfo

    return ZoneInfo(name)


def to_hudi_timestamp(value: str | int | float | datetime, timezone_name: str = "UTC") -> str:
    """Normalize any accepted form to yyyyMMddHHmmssSSS in the timeline
    timezone."""
    tz = _resolve_zone(timezone_name)
    if isinstance(value, datetime):
        if value.tzinfo is None:
            raise ValueError("naive datetime is ambiguous; attach a timezone")
        return _from_epoch_millis(int(value.timestamp() * 1000), tz)

    if isinstance(value, (int, float)):
        return _from_epoch_number(value, tz)

    s = str(value).strip()
    if s.isdigit():
        if len(s) in (14, 17):
            # already timeline format — validate round-trip
            datetime.strptime(s[:14], "%Y%m%d%H%M%S")
            return s if len(s) == 17 else s + "000"
        return _from_epoch_number(int(s), tz)

    # RFC3339; require an explicit offset
    iso = s.replace("Z", "+00:00")
    dt = datetime.fromisoformat(iso)
    if dt.tzinfo is None:
        raise ValueError(f"naive datetime is ambiguous, provide an offset: {value!r}")
    return _from_epoch_millis(int(dt.timestamp() * 1000), tz)


def _from_epoch_number(v: int | float, tz: tzinfo = timezone.utc) -> str:
    digits = len(str(int(abs(v))))
    for lo, hi, scale in _EPOCH_RANGES:
        if lo <= digits <= hi:
            millis = int(v / scale) if scale >= 1 else int(v * 1000)
            return _from_epoch_millis(millis, tz)
    raise ValueError(f"cannot infer epoch unit for: {v}")


def _from_epoch_millis(ms: int, tz: tzinfo = timezone.utc) -> str:
    dt = datetime.fromtimestamp(ms / 1000.0, tz=tz)
    return dt.strftime("%Y%m%d%H%M%S") + f"{ms % 1000:03d}"
