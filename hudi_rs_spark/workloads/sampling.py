"""Sampling / data-mixing workload over the documents table.

Runs the operators in hudi_rs_spark/operators/sampling.py; the DuckDB
oracle re-expresses the same md5-threshold selection with identical
IEEE arithmetic, so both engines pick the exact same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hudi_rs_spark.operators import sampling as S
from hudi_rs_spark.workloads import QuerySpec, register
from hudi_rs_spark.workloads.tables import load

# Per-source fractions exercised by the stratified query: a few explicit
# strata plus a default for the rest.
STRAT_FRACTIONS = {"src0": 0.75, "src1": 0.5, "src2": 0.25}
STRAT_DEFAULT = 0.1

# Target mix shares by language (must sum to 1); en is downweighted
# relative to its corpus share so every rate is a genuine thinning.
MIX_TARGETS = {"en": 0.4, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15}


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        S.stratified_sample(
            d, "doc_id", "source", STRAT_FRACTIONS, default=STRAT_DEFAULT
        )
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


def _u32_sql(salt: str) -> str:
    return f"('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || '{salt}'), 1, 8))::BIGINT"


_CASE = "CASE " + " ".join(
    f"WHEN source = '{k}' THEN {v!r}" for k, v in sorted(STRAT_FRACTIONS.items())
) + f" ELSE {STRAT_DEFAULT!r} END"

STRATIFIED_SQL = f"""
SELECT doc_id, source
FROM documents
WHERE {_u32_sql("strat")} < CAST(floor(({_CASE}) * 4294967296.0) AS BIGINT)
ORDER BY doc_id
"""


def sample_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        S.proportional_mix(d, "doc_id", "lang", MIX_TARGETS)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


_TGT_VALUES = ", ".join(f"('{k}', {v!r})" for k, v in sorted(MIX_TARGETS.items()))

# Rate arithmetic mirrors operators/sampling.py::proportional_mix in the
# same operation order (n_total * p / cnt * 2^32) so doubles agree bitwise.
MIX_SQL = f"""
WITH tgt(lang, p) AS (VALUES {_TGT_VALUES}),
counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS cnt FROM documents GROUP BY lang
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
)
SELECT d.doc_id, d.lang
FROM documents d JOIN rates ON d.lang = rates.lang
WHERE {_u32_sql("mix").replace("doc_id", "d.doc_id")} < rates.u32_thresh
ORDER BY d.doc_id
"""


def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        S.temperature_mix(d, "doc_id", "lang", alpha=0.5)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


# Rate arithmetic mirrors operators/sampling.py::temperature_mix:
# floor(sqrt(min_cnt) / sqrt(cnt) * 2^32) in the same op order; sqrt is
# IEEE-correctly-rounded so Spark and DuckDB agree bitwise.
TEMP_MIX_SQL = f"""
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS cnt FROM documents GROUP BY lang
),
m AS (SELECT min(cnt) AS min_cnt FROM counts),
rates AS (
  SELECT c.lang,
         CAST(floor(sqrt(CAST(m.min_cnt AS DOUBLE)) / sqrt(CAST(c.cnt AS DOUBLE))
              * 4294967296.0) AS BIGINT) AS u32_thresh
  FROM counts c CROSS JOIN m
)
SELECT d.doc_id, d.lang
FROM documents d JOIN rates ON d.lang = rates.lang
WHERE {_u32_sql("temp").replace("doc_id", "d.doc_id")} < rates.u32_thresh
ORDER BY d.doc_id
"""


def sample_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        S.shuffle_shard(d, "doc_id", n_shards=8)
        .select("doc_id", "shard", "pos")
        .orderBy("doc_id")
    )


SHUFFLE_SHARD_SQL = f"""
WITH u AS (
  SELECT doc_id, {_u32_sql("shuf")} AS uval FROM documents
)
SELECT doc_id,
       CAST(uval % 8 AS INTEGER) AS shard,
       CAST(row_number() OVER (PARTITION BY uval % 8 ORDER BY uval, doc_id)
            AS INTEGER) AS pos
FROM u
ORDER BY doc_id
"""


for _n, _f, _s, _d in [
    ("sample_stratified", sample_stratified, STRATIFIED_SQL, "per-stratum hash sample"),
    ("sample_weighted_mix", sample_weighted_mix, MIX_SQL, "proportional source mixing"),
    (
        "sample_temperature_mix",
        sample_temperature_mix,
        TEMP_MIX_SQL,
        "alpha-temperature source resampling (downsample-only closed form)",
    ),
    (
        "sample_shuffle_shard",
        sample_shuffle_shard,
        SHUFFLE_SHARD_SQL,
        "deterministic global shuffle into training shards",
    ),
]:
    register(QuerySpec(name=_n, build=_f, oracle=_s, tags=("sampling",), doc=_d))


def sample_split_leakfree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-cluster-atomic 80/20 split: MinHash-LSH pairs contracted
    into clusters, split decided on the canonical id."""
    from hudi_rs_spark.operators import dedup as D

    d = load(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(d, "text", "doc_id")
    out = S.leakage_free_split(d.select("doc_id"), "doc_id", pairs, frac_train=0.8)
    return out.select("doc_id", "canon_id", "split").orderBy("doc_id")


def _split_leakfree_sql() -> str:
    # canonical-id closure identical to CLUSTER_SQL (recursive CTE), then
    # the same md5-threshold coin flip as hash_sample — taken on canon_id.
    from hudi_rs_spark.workloads.dedup import MINHASH_CTE

    u32_canon = (
        "('0x' || substr(md5(CAST(canon_id AS VARCHAR) || '|' || 'split'), 1, 8))::BIGINT"
    )
    return MINHASH_CTE.replace("WITH docs", "WITH RECURSIVE docs", 1) + f""",
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
canon AS (
  SELECT d.doc_id, coalesce(roots.component, d.doc_id) AS canon_id
  FROM documents d LEFT JOIN roots ON roots.u = d.doc_id
)
SELECT doc_id, canon_id,
       CASE WHEN {u32_canon} < CAST(floor(0.8 * 4294967296.0) AS BIGINT)
            THEN 'train' ELSE 'val' END AS split
FROM canon
ORDER BY doc_id
"""


register(
    QuerySpec(
        name="sample_split_leakfree",
        build=sample_split_leakfree,
        oracle=_split_leakfree_sql(),
        tags=("sampling", "dedup"),
        doc="near-dup-cluster-atomic train/val split (no leakage across splits)",
    )
)
