"""Differential-test helper: Spark result vs DuckDB oracle.

Mimics the driver's t2 gate: order-insensitive compare after sorting
columns by name; exact equality (value-hash semantics), so any
nondeterminism shows up here first.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return v.item()
    except ImportError:
        pass
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None)
    if hasattr(v, "tolist"):  # numpy arrays / lists
        return tuple(v.tolist())
    if isinstance(v, list):
        return tuple(v)
    return v


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    """Rows as (typename, value) cells: the driver's value hash is typed,
    so int 1 vs float 1.0 must FAIL here too (Python == alone would pass —
    that's exactly how the r1 win_sessionize HUGEINT→float64 slip escaped
    the local gate)."""
    cols = sorted(df.columns)
    rows = [
        tuple(
            (type(c).__name__, c)
            for c in (_norm_cell(v) for v in row)
        )
        for row in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort(key=lambda r: tuple((x[1] is None, x[0], str(x[1])) for x in r))
    return rows


def compare(spark_df, oracle_df: pd.DataFrame) -> list[str]:
    """Returns a list of problems (empty = match)."""
    problems = []
    sdf = spark_df.toPandas()
    if sorted(sdf.columns) != sorted(oracle_df.columns):
        problems.append(
            f"column mismatch: spark={sorted(sdf.columns)} oracle={sorted(oracle_df.columns)}"
        )
        return problems
    if len(sdf) != len(oracle_df):
        problems.append(f"row count: spark={len(sdf)} oracle={len(oracle_df)}")
    a, b = canonical_rows(sdf), canonical_rows(oracle_df)
    if a != b:
        diffs = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:5]
        for i in diffs:
            problems.append(f"row {i}: spark={a[i]} oracle={b[i]}")
        if len(a) == len(b) and not diffs:
            pass
        elif not diffs:
            problems.append("rows differ in count tail")
    return problems
