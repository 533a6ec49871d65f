"""Avro JSON schema -> pyspark StructType mapping.

Follows the reference's avro->arrow table
(/root/reference/crates/core/src/avro_to_arrow/schema.rs:63-150) with the
Spark column from SURVEY.md §1.3: map values keep their type, unions
[null, T] become nullable T, decimal -> DecimalType(p,s), uuid -> string,
timestamp-millis/micros -> TimestampNTZ (Hudi writes naive timestamps).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T


def avro_to_spark_type(schema: Any) -> T.DataType:
    if isinstance(schema, str):
        prim = {
            "null": T.NullType(),
            "boolean": T.BooleanType(),
            "int": T.IntegerType(),
            "long": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "bytes": T.BinaryType(),
            "string": T.StringType(),
        }
        if schema in prim:
            return prim[schema]
        raise ValueError(f"unresolved named avro type: {schema}")

    if isinstance(schema, list):  # union
        non_null = [s for s in schema if s != "null"]
        if len(non_null) == 1:
            return avro_to_spark_type(non_null[0])
        raise ValueError(f"unsupported multi-type union: {schema}")

    t = schema["type"]
    lt = schema.get("logicalType")
    if lt == "decimal":
        return T.DecimalType(schema.get("precision", 10), schema.get("scale", 0))
    if lt == "date":
        return T.DateType()
    if lt in ("timestamp-millis", "timestamp-micros"):
        return T.TimestampNTZType()
    if lt in ("time-millis", "time-micros"):
        return T.LongType()
    if lt == "uuid":
        return T.StringType()

    if t == "record":
        return T.StructType(
            [
                T.StructField(f["name"], avro_to_spark_type(f["type"]), _nullable(f["type"]))
                for f in schema["fields"]
            ]
        )
    if t == "enum":
        return T.StringType()
    if t == "array":
        item = schema["items"]
        return T.ArrayType(avro_to_spark_type(item), _nullable(item))
    if t == "map":
        val = schema["values"]
        return T.MapType(T.StringType(), avro_to_spark_type(val), _nullable(val))
    if t == "fixed":
        return T.BinaryType()
    return avro_to_spark_type(t)


def _nullable(schema: Any) -> bool:
    return isinstance(schema, list) and "null" in schema


def avro_record_to_struct(schema: dict) -> T.StructType:
    st = avro_to_spark_type(schema)
    if not isinstance(st, T.StructType):
        raise ValueError("top-level avro schema is not a record")
    return st
