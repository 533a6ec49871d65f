"""Determinism helpers for differential testing against DuckDB.

Floating-point aggregation order differs between engines (and between runs
under AQE), so every money/measure aggregate goes through exact decimal
arithmetic and is only collapsed to DOUBLE after a final ROUND. Both
engines round half-away-from-zero for positive decimals, and the nearest
double to a 2-dp decimal is unique — so the resulting doubles hash-match.

Mirror rules for the DuckDB oracle SQL (write these inline in the SQL):
  measure  -> ROUND(SUM(CAST(x AS DECIMAL(18,6)) * ...), 2)::DOUBLE
  count    -> CAST(count(*) AS BIGINT)        (duckdb SUM(int) is HUGEINT)
  year     -> CAST(EXTRACT(year FROM d) AS INTEGER)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dec(c) -> Column:
    """Exact-arithmetic staging cast for a double measure column."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(DEC)


def round2(c: Column) -> Column:
    """Final output form for a decimal aggregate: round(2) -> double."""
    return F.round(c, 2).cast("double")


def round4(c: Column) -> Column:
    return F.round(c, 4).cast("double")


from hudi_rs_spark.functions.numeric import SQL_MICROF, microf  # noqa: E402,F401


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount), exact."""
    return dec("l_extendedprice") * (F.lit(1).cast(DEC) - dec("l_discount"))


def charge() -> Column:
    """l_extendedprice * (1 - l_discount) * (1 + l_tax), exact."""
    return disc_price() * (F.lit(1).cast(DEC) + dec("l_tax"))


# The same expressions in DuckDB SQL, for splicing into oracle strings.
SQL_DISC_PRICE = "CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))"
SQL_CHARGE = f"{SQL_DISC_PRICE} * (CAST(1 AS DECIMAL(18,6)) + CAST(l_tax AS DECIMAL(18,6)))"
