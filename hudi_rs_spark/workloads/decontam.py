"""Decontamination workload query, oracle-checked.

The eval set is carved deterministically from the documents table
(doc_id % 97 == 0 — no external data needed), so both engines see the
identical split. The oracle states the same semantics with a lateral
generate_series n-gram expansion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hudi_rs_spark.workloads import QuerySpec, register
from hudi_rs_spark.workloads.tables import load

_N = 13
_MOD = 97


def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs contaminated by the (doc_id % 97 == 0) eval split:
    distinct shared 13-gram count per contaminated doc."""
    from hudi_rs_spark.operators.decontam import decontaminate

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    rep = decontaminate(
        d, "text", "doc_id", eval_pred=(F.col("doc_id") % _MOD == 0), n=_N
    )
    return rep.select("doc_id", "n_shared").orderBy("doc_id")


DECONTAM_SQL = f"""
WITH d AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
  FROM documents
),
g AS (
  SELECT doc_id, substring(norm, CAST(i AS INTEGER), {_N}) AS gram
  FROM (
    SELECT doc_id, norm,
           unnest(generate_series(1, length(norm) - {_N - 1})) AS i
    FROM d
    WHERE length(norm) >= {_N}
  )
),
eval_grams AS (
  SELECT DISTINCT gram FROM g WHERE doc_id % {_MOD} = 0
),
train_grams AS (
  SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % {_MOD} <> 0
)
SELECT tg.doc_id, CAST(count(*) AS BIGINT) AS n_shared
FROM train_grams tg
JOIN eval_grams eg USING (gram)
GROUP BY tg.doc_id
ORDER BY doc_id
"""


register(
    QuerySpec(
        name="text_decontaminate",
        build=text_decontaminate,
        oracle=DECONTAM_SQL,
        tags=("text", "decontam"),
        doc="eval-set 13-gram overlap contamination report",
    )
)


def text_decontam_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contamination report via the broadcast-Bloom prefilter path
    (bitset probe map-side, exact confirm join on the survivors). The
    operator contract is exact, so the oracle is identical to
    text_decontaminate — what differs is the plan: at 100 TB the raw
    eval gram strings outgrow broadcast range while the 16-bit/gram
    bitset does not, and the corpus gram stream is reduced to ~0.1%
    before any join."""
    from hudi_rs_spark.operators.decontam import decontaminate_bloom

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    rep = decontaminate_bloom(
        d, "text", "doc_id", eval_pred=(F.col("doc_id") % _MOD == 0), n=_N
    )
    return rep.select("doc_id", "n_shared").orderBy("doc_id")


register(
    QuerySpec(
        name="text_decontam_bloom",
        build=text_decontam_bloom,
        oracle=DECONTAM_SQL,
        tags=("text", "decontam"),
        doc="broadcast-Bloom prefiltered 13-gram contamination report",
    )
)


def text_interdup_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document within-corpus 13-gram duplication profile.

    Runs the production path (64-bit xxhash64 gram keys on the shuffle
    wire — ~8 bytes/gram instead of raw 13+ byte strings). The outputs
    are COUNTS, not grams, so results differ from the raw-string oracle
    only on an xxhash64 collision within one corpus's distinct grams
    (p ~ n^2/2^65; verified bit-identical to raw grams on the sf0.01
    driver corpus and the sf0.1 bench corpus — deterministic hash, so
    'equal once' = 'equal always' for a fixed corpus)."""
    from hudi_rs_spark.operators.decontam import interdup_score

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return interdup_score(
        d, "text", "doc_id", n=_N, hash_grams=True
    ).orderBy("doc_id")


# Same normalization + gram expansion as DECONTAM_SQL; n_docs counted over
# distinct (doc_id, gram), then each doc's distinct grams scored against it.
# dup_frac is one IEEE double division of integer-valued casts (bit-portable).
INTERDUP_SQL = f"""
WITH d AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
  FROM documents
),
g AS (
  SELECT DISTINCT doc_id, substring(norm, CAST(i AS INTEGER), {_N}) AS gram
  FROM (
    SELECT doc_id, norm,
           unnest(generate_series(1, length(norm) - {_N - 1})) AS i
    FROM d
    WHERE length(norm) >= {_N}
  )
),
gd AS (
  SELECT gram, count(*) AS n_docs FROM g GROUP BY gram
)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN gd.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       CAST(sum(CASE WHEN gd.n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS dup_frac
FROM g JOIN gd USING (gram)
GROUP BY g.doc_id
ORDER BY doc_id
"""


register(
    QuerySpec(
        name="text_interdup_score",
        build=text_interdup_score,
        oracle=INTERDUP_SQL,
        tags=("text", "decontam"),
        doc="within-corpus 13-gram duplication fraction per document",
    )
)
