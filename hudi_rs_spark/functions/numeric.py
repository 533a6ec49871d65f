"""Numeric determinism helpers shared by operators and workloads."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def microf(c: Column) -> Column:
    """Deterministic 6-decimal truncation of a DOUBLE: floor(x*1e6)/1e6.

    ROUND on doubles resolves half-ties differently across engines
    (Spark goes through BigDecimal shortest-repr, DuckDB doesn't);
    multiply+floor+divide are plain IEEE ops, bit-identical everywhere.
    DuckDB mirror: floor(x * 1000000.0) / 1000000.0
    """
    return F.floor(c * F.lit(1000000.0)) / F.lit(1000000.0)


SQL_MICROF = "floor({x} * 1000000.0) / 1000000.0"
