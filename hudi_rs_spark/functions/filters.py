"""(field, op, value) filter triples -> Spark Columns.

Mirrors /root/reference/crates/core/src/expr/filter.rs:30-56 (model),
:108-140 (IN comma splitting), :344-387 (typed compares via cast). The
actual evaluation is delegated to Catalyst, which also pushes these into
the parquet scan (PushedFilters) — op 9 and op 24 of SURVEY §2 for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hudi_rs_spark.plans.partition_pruner import Filter


def _typed_lit(value: str, dtype: T.DataType) -> Column:
    return F.lit(value).cast(dtype)


def filter_to_column(f: Filter, schema: T.StructType) -> Column:
    if f.field not in schema.fieldNames():
        raise ValueError(f"filter column '{f.field}' not in schema")
    dtype = schema[f.field].dataType
    col = F.col(f.field)
    if f.op == "IN":
        return col.isin([_typed_lit(v, dtype) for v in f.values()])
    if f.op == "NOT IN":
        return ~col.isin([_typed_lit(v, dtype) for v in f.values()])
    rhs = _typed_lit(f.value, dtype)
    return {
        "=": col == rhs,
        "!=": col != rhs,
        "<": col < rhs,
        "<=": col <= rhs,
        ">": col > rhs,
        ">=": col >= rhs,
    }[f.op]


def apply_filters(df: DataFrame, filters: list[Filter]) -> DataFrame:
    for f in filters:
        df = df.filter(filter_to_column(f, df.schema))
    return df
