"""Similarity-search workload over embeddings, oracle-checked.

The LSH plane constants are generated deterministically (md5-seeded) in
Python and BAKED into the oracle SQL as literals, so both engines use the
identical planes — the oracle replicates bucketing exactly rather than
pretending LSH has perfect recall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hudi_rs_spark.operators import similarity as S
from hudi_rs_spark.workloads import QuerySpec, register
from hudi_rs_spark.workloads.tables import load

DIM = 64
TOPK = 5
N_QUERIES = 5  # vec_id < 5 are the query vectors

SQL_DOT = (
    "list_sum(list_transform(range(1, {dim} + 1),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)
SQL_NORM_V = (
    "sqrt(list_sum(list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)


def _sql_cosine(a: str, b: str) -> str:
    return (
        f"{SQL_DOT.format(dim=DIM, a=a, b=b)} / "
        f"({SQL_NORM_V.format(v=a)} * {SQL_NORM_V.format(v=b)})"
    )


def sim_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return S.brute_force_topk(emb, queries, "embedding", "vec_id", k=TOPK).orderBy(
        "query_id", "rank"
    )


BRUTE_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id, {_sql_cosine("qv", "cv")} AS cos
  FROM c CROSS JOIN q
  WHERE neighbor_id <> query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TOPK}
ORDER BY query_id, rank
"""


def _sql_plane_literal(seed: str, j: int) -> str:
    vals = S._plane(seed, DIM, j)
    return "[" + ", ".join(repr(v) for v in vals) + "]"


def _sql_bucket(
    vec: str, n_planes: int, seed: str = "hudi-rs-spark", plane_offset: int = 0
) -> str:
    terms = []
    for j in range(n_planes):
        plane = _sql_plane_literal(seed, plane_offset + j)
        dotj = SQL_DOT.format(dim=DIM, a=vec, b=f"CAST({plane} AS DOUBLE[])")
        terms.append(f"CASE WHEN {dotj} >= 0 THEN {1 << j} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


N_PLANES_ANN = 4  # coarse buckets so each query finds same-bucket candidates


def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return S.lsh_topk(
        emb, queries, DIM, "embedding", "vec_id", k=TOPK, n_planes=N_PLANES_ANN
    ).orderBy("query_id", "rank")


LSH_TOPK_SQL = f"""
WITH sigs AS (
  SELECT vec_id, embedding, {_sql_bucket("embedding", N_PLANES_ANN)} AS bucket
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM sigs WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv, bucket FROM sigs),
scored AS (
  SELECT query_id, neighbor_id, {_sql_cosine("qv", "cv")} AS cos
  FROM c JOIN q USING (bucket)
  WHERE neighbor_id <> query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TOPK}
ORDER BY query_id, rank
"""

N_CENTROIDS = 8
N_PROBE = 4


def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: md5-seeded centroids, nearest-cell inverted lists,
    nprobe-cell search, exact re-rank. Recall vs brute force is 0.6 at
    sf0.01 with nprobe=4/8 cells — the testdata embeddings are uniform
    random (near-orthogonal in 64-d, so cells carry little signal);
    clustered real embeddings fare far better at the same nprobe."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return S.ivf_topk(
        emb, queries, "embedding", "vec_id",
        k=TOPK, n_centroids=N_CENTROIDS, nprobe=N_PROBE,
    ).orderBy("query_id", "rank")


IVF_TOPK_SQL = f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cent
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT {N_CENTROIDS}
),
c_assign AS (
  SELECT neighbor_id, cvec, cid FROM (
    SELECT c.vec_id AS neighbor_id, c.embedding AS cvec, ce.cid,
           row_number() OVER (
             PARTITION BY c.vec_id
             ORDER BY {_sql_cosine("c.embedding", "ce.cent")} DESC, ce.cid ASC
           ) AS r
    FROM embeddings c CROSS JOIN cents ce
  ) WHERE r = 1
),
q_assign AS (
  SELECT query_id, qvec, cid FROM (
    SELECT q.vec_id AS query_id, q.embedding AS qvec, ce.cid,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY {_sql_cosine("q.embedding", "ce.cent")} DESC, ce.cid ASC
           ) AS r
    FROM embeddings q CROSS JOIN cents ce
    WHERE q.vec_id < {N_QUERIES}
  ) WHERE r <= {N_PROBE}
),
scored AS (
  SELECT DISTINCT query_id, neighbor_id, {_sql_cosine("qvec", "cvec")} AS cos
  FROM c_assign JOIN q_assign USING (cid)
  WHERE neighbor_id <> query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TOPK}
ORDER BY query_id, rank
"""

N_BANDS_DEDUP = 4
PLANES_PER_BAND_DEDUP = 8
DUP_THRESHOLD = 0.9


def sim_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded multi-table hyperplane LSH (OR of 4 bands x 8 planes) —
    per-band bucket population ~n/256 scales with the corpus, unlike the
    r6 single fixed-width signature (constant bucket count -> O(n^2)
    within-bucket pairs at scale)."""
    emb = load(spark, sf_dir, "embeddings")
    return S.embedding_near_dups(
        emb, "embedding", "vec_id", threshold=DUP_THRESHOLD, dim=DIM,
        n_bands=N_BANDS_DEDUP, planes_per_band=PLANES_PER_BAND_DEDUP,
    ).orderBy("id_a", "id_b")


def _near_dup_band_keys() -> str:
    """UNION ALL of one (vec_id, band, sig) projection per band, each
    band hashing its own disjoint plane range — the oracle mirror of the
    exploded (band, sig) keys."""
    selects = [
        f"SELECT vec_id, {b} AS band, "
        + _sql_bucket(
            "embedding", PLANES_PER_BAND_DEDUP,
            plane_offset=b * PLANES_PER_BAND_DEDUP,
        )
        + " AS sig FROM embeddings"
        for b in range(N_BANDS_DEDUP)
    ]
    return "\n  UNION ALL\n  ".join(selects)


NEAR_DUP_SQL = f"""
WITH keys AS (
  {_near_dup_band_keys()}
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM keys a JOIN keys b ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id
)
SELECT id_a, id_b
FROM cand
JOIN embeddings ea ON ea.vec_id = cand.id_a
JOIN embeddings eb ON eb.vec_id = cand.id_b
WHERE {_sql_cosine("ea.embedding", "eb.embedding")} >= {DUP_THRESHOLD}
ORDER BY id_a, id_b
"""


KMEANS_K = 8
KMEANS_ITERS = 2


def sim_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic integer k-means over the embeddings table
    (operators/clustering.py) — SemDeDup-style semantic grouping."""
    from hudi_rs_spark.operators.clustering import kmeans_assign

    emb = load(spark, sf_dir, "embeddings")
    out = kmeans_assign(emb, "vec_id", "embedding", k=KMEANS_K, iterations=KMEANS_ITERS)
    return out.select(
        F.col("id").alias("vec_id"),
        F.col("cid").alias("cluster"),
        "dist2",
    ).orderBy("vec_id")


def _km_assign_cte(name: str, cent: str) -> str:
    """One assignment round: nearest centroid in exact BIGINT distance,
    ties to the lowest cluster id (mirrors min(struct(dist2, cid)))."""
    return f"""{name} AS (
  SELECT id, cid, dist2 FROM (
    SELECT q.id, c.cid,
           CAST(list_sum(list_transform(range(1, 65),
                i -> (q.q[i] - c.cq[i]) * (q.q[i] - c.cq[i]))) AS BIGINT) AS dist2,
           row_number() OVER (PARTITION BY q.id
                              ORDER BY list_sum(list_transform(range(1, 65),
                                i -> (q.q[i] - c.cq[i]) * (q.q[i] - c.cq[i]))), c.cid) AS rn
    FROM q CROSS JOIN {cent} c
  ) WHERE rn = 1
)"""


def _km_update_cte(assign: str, cells: str, cent: str) -> str:
    """Centroid update: exact integer mean per (cluster, dim) via the
    positive-remainder floor-division identity."""
    return f"""{cells} AS (
  SELECT cid, pos, sum(v) AS s, count(*) AS n FROM (
    SELECT {assign}.cid, unnest(range(1, 65)) AS pos, unnest(q.q) AS v
    FROM {assign} JOIN q ON {assign}.id = q.id
  ) GROUP BY cid, pos
),
{cent} AS (
  SELECT cid, list(CAST((s - ((s % n) + n) % n) // n AS BIGINT) ORDER BY pos) AS cq
  FROM {cells} GROUP BY cid
)"""


KMEANS_SQL = f"""
WITH q AS (
  SELECT vec_id AS id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
  FROM embeddings
),
seeded AS (SELECT id, q, md5(CAST(id AS VARCHAR)) AS seed FROM q),
init AS (
  SELECT CAST(row_number() OVER (ORDER BY seed, id) AS INTEGER) AS cid, q AS cq
  FROM (SELECT * FROM seeded ORDER BY seed, id LIMIT {KMEANS_K})
),
{_km_assign_cte("a1", "init")},
{_km_update_cte("a1", "cells1", "c1")},
{_km_assign_cte("a2", "c1")},
{_km_update_cte("a2", "cells2", "c2")},
{_km_assign_cte("a3", "c2")}
SELECT id AS vec_id, cid AS cluster, dist2 FROM a3 ORDER BY vec_id
"""


def sim_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-k over int8-QUANTIZED vectors (symmetric scalar
    quantization, scale = max|x|/127 per vector). The score is the
    quantized cosine — integer dot / sqrt of integer norms, so both
    engines rank on bit-identical doubles. At 100 TB this is the
    production ANN rep: 4x fewer corpus bytes in scan/shuffle/broadcast
    and integer-SIMD scoring, with the same (query_id, neighbor_id,
    rank) contract as the float path."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return S.int8_brute_topk(
        emb, queries, "embedding", "vec_id", k=TOPK
    ).orderBy("query_id", "rank")


_SQL_MAXABS = "list_max(list_transform({v}, x -> abs(CAST(x AS DOUBLE))))"

INT8_TOPK_SQL = f"""
WITH scl AS (
  SELECT vec_id, embedding,
         CASE WHEN {_SQL_MAXABS.format(v="embedding")} = 0 THEN 1.0
              ELSE {_SQL_MAXABS.format(v="embedding")} / 127.0 END AS s
  FROM embeddings
),
qz AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) / s + 0.5) AS BIGINT)) AS qvec
  FROM scl
),
qn AS (
  SELECT vec_id, qvec,
         CAST(list_sum(list_transform(qvec, x -> x * x)) AS BIGINT) AS qnorm
  FROM qz
),
q AS (SELECT vec_id AS query_id, qvec AS qv, qnorm AS qq
      FROM qn WHERE vec_id < {N_QUERIES} AND qnorm > 0),
c AS (SELECT vec_id AS neighbor_id, qvec AS cv, qnorm AS cc
      FROM qn WHERE qnorm > 0),
scored AS (
  SELECT query_id, neighbor_id,
         CAST(list_sum(list_transform(range(1, {DIM} + 1), i -> qv[i] * cv[i])) AS DOUBLE)
           / sqrt(CAST(qq * cc AS DOUBLE)) AS qcos
  FROM c CROSS JOIN q
  WHERE neighbor_id <> query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY qcos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TOPK}
ORDER BY query_id, rank
"""


for _n, _f, _s, _d in [
    ("sim_brute_topk", sim_brute_topk, BRUTE_SQL, "brute-force cosine top-k"),
    ("sim_int8_topk", sim_int8_topk, INT8_TOPK_SQL, "int8-quantized cosine top-k"),
    ("sim_lsh_topk", sim_lsh_topk, LSH_TOPK_SQL, "LSH-bucketed ANN top-k"),
    ("sim_ivf_topk", sim_ivf_topk, IVF_TOPK_SQL, "IVF inverted-list ANN top-k"),
    ("sim_embedding_near_dups", sim_embedding_near_dups, NEAR_DUP_SQL, "embedding near-dup pairs"),
    ("sim_kmeans_clusters", sim_kmeans_clusters, KMEANS_SQL, "deterministic integer k-means"),
]:
    register(QuerySpec(name=_n, build=_f, oracle=_s, tags=("similarity",), doc=_d))


def sim_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: k-means blocking + within-cluster cosine pruning with
    the deterministic min-id survivor rule."""
    from hudi_rs_spark.operators.clustering import semdedup

    emb = load(spark, sf_dir, "embeddings")
    out = semdedup(
        emb, "vec_id", "embedding",
        k=KMEANS_K, iterations=KMEANS_ITERS, threshold=DUP_THRESHOLD,
    )
    return out.select(
        F.col("id").alias("vec_id"), F.col("cid").alias("cluster"), "kept"
    ).orderBy("vec_id")


# The k-means CTE chain is identical to KMEANS_SQL (same init, same two
# update rounds); dropped = ids with a lower-id same-cluster member at
# cosine >= threshold, mirroring the min-id survivor rule.
SEMDEDUP_SQL = f"""
WITH q AS (
  SELECT vec_id AS id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
  FROM embeddings
),
seeded AS (SELECT id, q, md5(CAST(id AS VARCHAR)) AS seed FROM q),
init AS (
  SELECT CAST(row_number() OVER (ORDER BY seed, id) AS INTEGER) AS cid, q AS cq
  FROM (SELECT * FROM seeded ORDER BY seed, id LIMIT {KMEANS_K})
),
{_km_assign_cte("a1", "init")},
{_km_update_cte("a1", "cells1", "c1")},
{_km_assign_cte("a2", "c1")},
{_km_update_cte("a2", "cells2", "c2")},
{_km_assign_cte("a3", "c2")},
dropped AS (
  SELECT DISTINCT b.id
  FROM a3 a
  JOIN a3 b ON a.cid = b.cid AND a.id < b.id
  JOIN embeddings ea ON ea.vec_id = a.id
  JOIN embeddings eb ON eb.vec_id = b.id
  WHERE {_sql_cosine("ea.embedding", "eb.embedding")} >= {DUP_THRESHOLD}
)
SELECT a3.id AS vec_id, a3.cid AS cluster, (d.id IS NULL) AS kept
FROM a3 LEFT JOIN dropped d ON a3.id = d.id
ORDER BY vec_id
"""


register(
    QuerySpec(
        name="sim_semdedup",
        build=sim_semdedup,
        oracle=SEMDEDUP_SQL,
        tags=("similarity",),
        doc="SemDeDup: k-means blocking + within-cluster cosine pruning",
    )
)
