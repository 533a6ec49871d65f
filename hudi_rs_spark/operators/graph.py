"""Distributed connected components for duplicate-cluster resolution.

Pairwise near-dup detectors (MinHash LSH, SimHash, Jaccard — see
``operators/dedup.py``) emit candidate *edges*; an actual dedup pipeline
must contract those edges into clusters and pick one canonical survivor
per cluster.  This module does that contraction with pure DataFrame ops.

Algorithm: iterative min-label propagation with pointer doubling.  Each
round every node takes the minimum label over itself and its neighbors,
then shortcuts through its own label (label(u) <- label(label(u)), the
path-compression step of Kiveris et al., "Connected Components in
MapReduce and Beyond").  At fixpoint every node carries the minimum id
of its connected component, which is the canonical (survivor) id.  The
result is deterministic regardless of execution or iteration order.

Scale notes (the 100 TB story):
- Two shuffles per round, keyed by node id — uniform (ids), no skew.
- Rounds needed = O(log diameter) thanks to the doubling step: labels
  hop two pointer levels per round, so even a chain of 10^6 edges
  converges well inside the default ``max_rounds=20`` (2^20 reach).
  LSH duplicate clusters are quasi-cliques (diameter 2-3), finishing
  in 2 rounds.  If the budget is STILL exhausted with labels moving,
  we raise instead of silently returning non-fixpoint labels — a
  wrong canonical map would diverge from the exact recursive-CTE
  oracle and corrupt downstream dedup.
- Iterative Spark pitfall: each round extends the lineage chain, and
  the planner re-executes it from the source every action.  We truncate
  with eager ``localCheckpoint`` per round, so round k+1 reads round
  k's materialized labels, not a k-deep plan.

Reference scope note: apache/hudi-rs has no graph operator; this is part
of the training-data-pipeline surface this repo adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hudi_rs_spark.operators.pin import pin


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 20,
    assume_distinct: bool = False,
) -> DataFrame:
    """Resolve undirected ``edges`` into components.

    Returns (node, component) where ``component`` is the minimum node id
    reachable from ``node`` — only for nodes that appear in some edge
    (isolated nodes are their own trivial component; callers join them
    back, see ``workloads/dedup.py::dedup_cluster_canonical``).

    Runs at most ``max_rounds`` label-propagation rounds, stopping as
    soon as a round changes no label (for LSH dup clusters: 2-3 rounds).

    ``assume_distinct``: pass True when the input is already a distinct
    canonical pair set with ``src < dst`` per row (every ``*_pairs``
    detector in ``operators/dedup.py`` / ``operators/similarity.py``
    guarantees this) — the symmetrized union then cannot contain
    duplicates and the dedup shuffle is skipped. Duplicate edges would
    only waste work (min is idempotent), never change the result.
    """
    # Materialize the incoming edge plan FIRST: both branches of the
    # symmetrize union would otherwise re-execute it (for LSH pairs that
    # means running the whole minhash pipeline twice — measured ~2x the
    # operator cost), and every propagation round would again.
    edges = pin(edges.select(F.col(src).alias("u"), F.col(dst).alias("v")))
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # The edge set is static and small relative to the corpus (near-dup
    # pairs), so persist the symmetric form once and reuse it each round.
    if not assume_distinct:
        sym = sym.distinct()
    sym = sym.persist()

    # Round 0 fused: label(u) = min(u, min neighbor).
    labels = pin(
        sym.groupBy("u")
        .agg(F.min("v").alias("nmin"))
        .select("u", F.least(F.col("u"), F.col("nmin")).alias("label"))
    )

    for _ in range(max_rounds):
        # min label among neighbors: edge (u,v) contributes label(v) to u.
        neigh = (
            sym.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("nlabel"))
        )
        prop = labels.withColumnRenamed("label", "prev").join(neigh, "u", "left")
        prop = prop.select(
            "u",
            "prev",
            F.least(F.col("prev"), F.coalesce(F.col("nlabel"), F.col("prev"))).alias(
                "mid"
            ),
        )
        # Pointer doubling: shortcut through the label's own label.  A
        # label is always a node id in the same component, and every
        # such node has a row in `prop`, so the lookup is a self-join.
        ptr = prop.select(F.col("u").alias("pk"), F.col("mid").alias("pv"))
        updated = (
            prop.join(ptr, prop["mid"] == ptr["pk"], "left")
            .select(
                "u",
                F.least(F.col("mid"), F.coalesce(F.col("pv"), F.col("mid"))).alias(
                    "label"
                ),
                "prev",
            )
            .select(
                "u", "label", (F.col("label") < F.col("prev")).alias("changed")
            )
        )
        updated = pin(updated)
        # Convergence probe on the materialized round: isEmpty is a
        # take(1) — it stops at the first changed row instead of
        # scanning every partition the way count() does. Converging
        # rounds (the common case until the last) get cheaper; the
        # final all-partitions scan happens once.
        converged = updated.filter(F.col("changed")).isEmpty()
        labels = updated.drop("changed")
        if converged:
            break
    else:
        sym.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            "(graph diameter > 2^max_rounds is implausible — investigate "
            "the edge set); refusing to return non-fixpoint labels"
        )

    sym.unpersist()
    return labels.select(F.col("u").alias("node"), F.col("label").alias("component"))
