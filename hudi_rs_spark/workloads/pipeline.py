"""End-to-end curation pipeline: the flagship composition query.

Chains four pipeline operators the way a real training-data curation
job would — quality filter -> near-dup cluster survivors -> target-share
language mixing -> token-budget shard packing — and proves the whole
composition against one DuckDB oracle, hash-exact.

Every stage reuses the already-oracle-verified building block:
quality_score (text.py), minhash_lsh_pairs + connected_components
(dedup.py / graph.py), proportional_mix (sampling.py), pack_sequences
(packing.py). The Spark plan is one job: scans once, LSH equi-join for
pairs, a handful of label-propagation rounds on the (tiny) pair set,
broadcast rate lookup, one window prefix-sum — no collects, no
cross-joins, every shuffle keyed (doc id / band bucket / lang).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hudi_rs_spark.operators import dedup as D
from hudi_rs_spark.operators import text as T
from hudi_rs_spark.operators.graph import connected_components
from hudi_rs_spark.operators.packing import pack_sequences
from hudi_rs_spark.operators.sampling import proportional_mix
from hudi_rs_spark.workloads import QuerySpec, register
from hudi_rs_spark.workloads.dedup import minhash_cte
from hudi_rs_spark.workloads.sampling import MIX_TARGETS
from hudi_rs_spark.workloads.tables import load

QUALITY_MIN = 0.95
CAPACITY = 500


def pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    kept = d.withColumn("quality", T.quality_score(F.col("text"))).filter(
        F.col("quality") >= QUALITY_MIN
    )
    pairs = D.minhash_lsh_pairs(kept, "text", "doc_id")
    comp = connected_components(pairs, assume_distinct=True).withColumnRenamed("node", "doc_id")
    survivors = (
        kept.join(comp, "doc_id", "left")
        .filter(F.col("component").isNull() | (F.col("component") == F.col("doc_id")))
        .drop("component")
    )
    mixed = proportional_mix(survivors, "doc_id", "lang", MIX_TARGETS)
    toks = mixed.withColumn(
        "n_tokens", F.size(F.split(F.col("text"), " ")).cast("bigint")
    )
    return pack_sequences(toks, "doc_id", "n_tokens", CAPACITY, "lang").orderBy(
        "doc_id"
    )


# ---- oracle ---------------------------------------------------------------
# Quality CTE mirrors workloads/text.py::QUALITY_SQL's arithmetic
# (micro-floored ratios); the minhash chain is rebound onto the kept set.

_QUALITY_KEPT = f"""
qf AS (
  SELECT doc_id, lang, text,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
         length(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tokens
  FROM documents
),
qr AS (
  SELECT doc_id, lang, text, n_tokens,
         floor(CAST(n_alpha AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE) * 1000000.0) / 1000000.0 AS alpha_ratio,
         floor(CAST(n_punct AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE) * 1000000.0) / 1000000.0 AS punct_ratio
  FROM qf
),
kept AS (
  SELECT doc_id, lang, text FROM qr
  WHERE floor(greatest(least(
          least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * 0.4
          + alpha_ratio * 0.5
          - least(punct_ratio * 5.0, 1.0) * 0.2
          + 0.3, 1.0), 0.0) * 1000000.0) / 1000000.0 >= {QUALITY_MIN}
)"""

_MINHASH_ON_KEPT = minhash_cte("kept").strip()[len("WITH ") :]

_CLOSURE = """
edges AS (
  SELECT id_a AS u, id_b AS v FROM cand
  UNION
  SELECT id_b, id_a FROM cand
),
walk(u, r) AS (
  SELECT u, v AS r FROM edges
  UNION
  SELECT w.u, e.v AS r FROM walk w JOIN edges e ON e.u = w.r
),
roots AS (
  SELECT u, least(u, min(r)) AS component FROM walk GROUP BY u
),
survivors AS (
  SELECT k.doc_id, k.lang, k.text
  FROM kept k LEFT JOIN roots ON roots.u = k.doc_id
  WHERE roots.component IS NULL OR roots.component = k.doc_id
)"""

_TGT_VALUES = ", ".join(f"('{k}', {v!r})" for k, v in sorted(MIX_TARGETS.items()))

_MIX_PACK = f"""
tgt(lang, p) AS (VALUES {_TGT_VALUES}),
counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS cnt FROM survivors GROUP BY lang
),
ratios AS (
  SELECT c.lang, c.cnt, t.p, c.cnt / t.p AS ratio
  FROM counts c JOIN tgt t ON c.lang = t.lang
),
feasible AS (SELECT min(ratio) AS n_total FROM ratios),
rates AS (
  SELECT r.lang,
         CAST(floor(f.n_total * r.p / r.cnt * 4294967296.0) AS BIGINT) AS u32_thresh
  FROM ratios r CROSS JOIN feasible f
),
mixed AS (
  SELECT s.doc_id, s.lang, s.text
  FROM survivors s JOIN rates ON s.lang = rates.lang
  WHERE ('0x' || substr(md5(CAST(s.doc_id AS VARCHAR) || '|' || 'mix'), 1, 8))::BIGINT
        < rates.u32_thresh
),
toks AS (
  SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM mixed
),
packed AS (
  SELECT doc_id, lang, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           - n_tokens AS start_offset
  FROM toks
)
SELECT doc_id, lang, n_tokens, start_offset, start_offset // {CAPACITY} AS shard
FROM packed
ORDER BY doc_id
"""

PIPELINE_SQL = (
    "WITH RECURSIVE "
    + _QUALITY_KEPT.strip()
    + ",\n"
    + _MINHASH_ON_KEPT
    + ",\n"
    + _CLOSURE.strip()
    + ",\n"
    + _MIX_PACK.strip()
)

register(
    QuerySpec(
        name="pipeline_curate",
        build=pipeline_curate,
        oracle=PIPELINE_SQL,
        tags=("pipeline",),
        doc="quality -> near-dup survivors -> mix -> pack, end to end",
    )
)
