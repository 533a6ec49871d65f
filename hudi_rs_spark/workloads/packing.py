"""Sequence-packing workload: shard the documents table by token budget.

Runs operators/packing.py::pack_sequences per source stream; the DuckDB
oracle replays the same window prefix-sum with exact integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hudi_rs_spark.operators.packing import pack_sequences
from hudi_rs_spark.workloads import QuerySpec, register
from hudi_rs_spark.workloads.tables import load

CAPACITY = 500  # tokens per shard (small enough to yield several shards per source at test SFs)


def pack_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(F.split(F.col("text"), " ")).cast("bigint")
    )
    return pack_sequences(d, "doc_id", "n_tokens", CAPACITY, "source").orderBy(
        "doc_id"
    )


PACK_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
packed AS (
  SELECT doc_id, source, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           - n_tokens AS start_offset
  FROM toks
)
SELECT doc_id, source, n_tokens, start_offset, start_offset // {CAPACITY} AS shard
FROM packed
ORDER BY doc_id
"""

register(
    QuerySpec(
        name="pack_token_shards",
        build=pack_token_shards,
        oracle=PACK_SQL,
        tags=("packing",),
        doc="token-budget shard assignment",
    )
)
