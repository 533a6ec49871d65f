"""PII detection and redaction for training-data pipelines.

Regex-based detectors for the common wire formats (emails, phone
numbers, IPv4 addresses) plus a redactor that rewrites every match with
a typed placeholder. Everything is built-in JVM regex work — a pure
projection over the scan: no shuffle, no UDF, scales with the scan.

Pattern syntax is restricted to the intersection of Java regex (Spark)
and RE2 (DuckDB oracle): character classes, bounded repetition, no
backreferences or lookaround — so detection is oracle-checkable.

Reference scope note: apache/hudi-rs has no PII operators; this is part
of the training-data-pipeline surface this repo adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Order matters for redaction: emails first (an email contains no phone/
# ip match, but redacting ips before emails could split a hostname-less
# mailbox — keep the list as the contract).
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"),
    ("phone", r"\+[0-9]{1,3} [0-9]{3}-[0-9]{4}"),
]


def pii_counts(text: Column) -> list[Column]:
    """One INT match-count column per PII kind, aliased n_<kind>."""
    return [
        F.regexp_count(text, F.lit(pat)).cast("int").alias(f"n_{kind}")
        for kind, pat in PII_PATTERNS
    ]


def redact(text: Column) -> Column:
    """Replace every PII match with its typed placeholder (<EMAIL>, ...)."""
    out = text
    for kind, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out


def pii_scrub(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document PII stats + redacted text.

    Returns (id, n_email, n_ipv4, n_phone, redacted) — a single
    projection, no shuffle."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        *pii_counts(t),
        redact(t).alias("redacted"),
    )
