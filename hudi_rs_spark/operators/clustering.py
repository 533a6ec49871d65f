"""Deterministic k-means clustering over embedding columns.

The training-data use case is SemDeDup-style semantic grouping: cluster
document embeddings, then dedup/filter within clusters. Floating-point
k-means is irreproducible on a cluster (reduction order changes the
centroids); this implementation is *exactly* deterministic, on any
partitioning, by doing all arithmetic in scaled integers:

- quantize: ``q_d = floor(x_d * 10^6)`` per dimension (embeddings live
  in [-1, 1], so |q| <= 10^6);
- distances: ``sum((q_d - c_d)^2)`` in BIGINT — max 64 * (2*10^6)^2
  ~= 2.6*10^14, far under 2^63, and integer sums are order-independent;
- centroid update: floor division via the positive-remainder identity
  ``(s - ((s % n) + n) % n) / n`` — identical in engines that disagree
  on negative integer division (truncation vs floor);
- init: the k vectors whose md5(vec_id) sorts smallest (a deterministic
  pseudo-random draw), numbered in that order.

Plan shape per iteration: assignment is a broadcast crossJoin against
the k centroids (n*k vectorized BIGINT array ops, no shuffle of the
corpus); the update explodes assigned vectors to (cluster, dim) cells
and partial-aggregates — shuffle carries k*D cells. Iteration count is
fixed (hyperparameter), so the whole operator is a static plan.

Reference scope note: apache/hudi-rs has no clustering operator; this
is part of the training-data-pipeline surface this repo adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

QUANT_SCALE = 1_000_000


def quantize(vec_col: str) -> F.Column:
    """array<float> -> array<bigint> at QUANT_SCALE (exact, portable)."""
    return F.expr(
        f"transform({vec_col}, x -> bigint(floor(double(x) * {QUANT_SCALE})))"
    )


def _dist2(a: str, b: str) -> F.Column:
    """Exact BIGINT squared L2 distance between two quantized arrays."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
        " bigint(0), (acc, v) -> acc + v)"
    )


def kmeans_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iterations: int = 2,
) -> DataFrame:
    """Cluster rows of ``df`` by their embedding; returns
    (id, cluster, dist2) with ``cluster`` in [1, k].

    ``iterations`` centroid updates run before the final assignment;
    ties in distance break to the lowest cluster id (total order), so
    the output is unique and reproducible.
    """
    q = df.select(F.col(id_col).alias("id"), quantize(vec_col).alias("q"))

    # deterministic init: k smallest md5(id), numbered in md5 order
    seeded = q.select(
        "id", "q", F.md5(F.col("id").cast("string")).alias("seed")
    )
    centroids = (
        seeded.orderBy("seed", "id")
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy("seed", "id")).alias("cid"),
            F.col("q").alias("cq"),
        )
    )

    for _ in range(iterations):
        assigned = _assign(q, centroids)
        # update: explode to (cluster, dim) cells, exact integer mean
        cells = (
            assigned.join(q, "id")
            .select("cid", F.posexplode("q").alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .select(
                "cid",
                "pos",
                F.expr("(s - ((s % n) + n) % n) div n").alias("m"),
            )
        )
        centroids = (
            cells.groupBy("cid")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, m))), c -> c.m)"
                ).alias("cq")
            )
            # Truncate the iterative lineage: each round's centroid plan
            # otherwise EMBEDS the previous round's full assignment plan
            # (and _assign references centroids twice), so the final
            # plan replicates the corpus scan ~2^iterations times
            # (measured: 20 source scans at iterations=2 when composed
            # downstream). The checkpoint is k rows — one centroid per
            # cluster — materialized immediately.
            .localCheckpoint(eager=True)
        )

    return _assign(q, centroids, keep_dist=True)


def _assign(q: DataFrame, centroids: DataFrame, keep_dist: bool = False) -> DataFrame:
    scored = q.crossJoin(F.broadcast(centroids)).select(
        "id", "cid", _dist2("q", "cq").alias("dist2")
    )
    best = scored.groupBy("id").agg(
        F.min(F.struct("dist2", "cid")).alias("b")
    )
    cols = [F.col("id"), F.col("b.cid").alias("cid")]
    if keep_dist:
        cols.append(F.col("b.dist2").alias("dist2"))
    return best.select(*cols)


def semdedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iterations: int = 2,
    threshold: float = 0.9,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup = k-means blocking,
    then exact-cosine near-dup pruning *within* each cluster.

    Returns (id, cluster, kept, dist2): ``kept`` is False iff some
    lower-id member of the same cluster is cosine-similar above
    ``threshold`` — the deterministic min-id survivor rule, so the
    output is reproducible on any partitioning.

    Scale: the within-cluster candidate set is the SemDeDup blocking
    contract — ``k`` is the blocking parameter and must grow with the
    corpus (the paper runs 50k clusters over LAION) so cluster
    population ``n/k`` stays bounded; pair work is then
    ``O(k * (n/k)^2) = O(n^2 / k)`` with a constant per-cluster bound.
    The pair join is an equi-join on cluster id (one shuffle), exact
    cosine runs JVM-side on the joined rows, and the final kept-flag is
    a broadcast-size anti-ish left join of dropped ids.
    """
    from hudi_rs_spark.operators.similarity import cosine

    # The assignment feeds three plan branches (both pair-join sides and
    # the final kept-flag join); materialize it once — (id, cid, dist2)
    # rows, corpus-sized but narrow — instead of clustering three times.
    assigned = kmeans_assign(df, id_col, vec_col, k, iterations).localCheckpoint(
        eager=True
    )
    vecs = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    withv = assigned.select("id", "cid").join(vecs, "id")
    a = withv.select("cid", F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = withv.select("cid", F.col("id").alias("id_b"), F.col("v").alias("vb"))
    dropped = (
        a.join(b, "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cosine(F.col("va"), F.col("vb")) >= F.lit(float(threshold)))
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    return assigned.join(
        dropped.withColumn("__drop", F.lit(True)), "id", "left"
    ).select("id", "cid", F.col("__drop").isNull().alias("kept"), "dist2")
