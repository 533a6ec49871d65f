"""Benchmark decontamination: flag training documents that share any
character n-gram with a held-out evaluation set.

The standard guard in LLM training-data pipelines (GPT-3 used 13-gram
overlap; The Pile and most open corpora follow): an eval document's
n-grams form a blocklist, and any training document containing one is
contaminated and must be dropped or audited.

Spark-first shape:
- n-gram extraction = explode over character positions, all JVM-side
  (``sequence`` + ``explode`` + ``substring``) — no Python, no
  higher-order-function lambda (which would re-evaluate the normalized
  text per element).
- the eval side is distinct-reduced first; an eval set is orders of
  magnitude smaller than the corpus, so its gram set broadcasts and the
  contamination check is a broadcast semi-ish join — the training
  corpus is never shuffled at all, only scanned and aggregated on
  doc_id (map-side combine applies).
- at true scale, hash the gram to a 64-bit key before the join
  (16 bytes -> 8 per candidate) and/or bloom-filter the eval grams into
  executors; raw grams are kept here for bit-exact oracle parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hudi_rs_spark.operators.pin import pin

from hudi_rs_spark.operators.dedup import normalized


def char_ngrams(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, gram) rows: every normalized character n-gram per document.
    Documents shorter than ``n`` normalized chars produce no rows.

    The normalization (two regexes) MUST evaluate once per document, but
    the position-explode + substring both reference the normalized
    column, and Catalyst's CollapseProject/ColumnPruning would re-inline
    the regex chain into the per-gram projection — measured ~10x slower
    (same trap the minhash shingle pipeline documents, dedup.py). The
    repartition Exchange below is the optimizer barrier that pins the
    normalized text to one evaluation per doc, and doubles as the
    parallelism spread for single-split inputs; it shuffles (id, norm)
    once — corpus-linear, same cost class as reading the text.
    """
    norm_df = df.select(
        F.col(id_col), normalized(F.col(text_col)).alias("_norm")
    ).repartition(df.sparkSession.sparkContext.defaultParallelism)
    positions = F.when(
        F.length("_norm") >= n,
        F.sequence(F.lit(1), F.length("_norm") - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    return norm_df.select(
        id_col, "_norm", F.explode(positions).alias("_pos")
    ).select(id_col, F.expr(f"substring(_norm, _pos, {int(n)})").alias("gram"))


def decontaminate(
    df: DataFrame,
    text_col: str,
    id_col: str,
    eval_pred: Column,
    n: int = 13,
) -> DataFrame:
    """Contamination report: for each NON-eval document sharing >= 1
    character ``n``-gram with any eval document (``eval_pred`` selects
    the eval rows), the count of distinct shared grams.

    Returns (id, n_shared) for contaminated docs only.
    """
    # split FIRST so each side explodes only its own documents: the eval
    # side is tiny (its distinct gram set broadcasts), and the train side
    # is exploded exactly once.
    eval_grams = (
        char_ngrams(df.filter(eval_pred), text_col, id_col, n)
        .select("gram")
        .distinct()
    )
    train_grams = char_ngrams(df.filter(~eval_pred), text_col, id_col, n)
    # join BEFORE dedup: only grams that hit the (small, broadcast) eval
    # blocklist survive to the aggregation; count_distinct dedups repeats
    # of a gram within one doc. The bulk gram stream is filtered map-side
    # against the broadcast — gram rows never hash-shuffle.
    return (
        train_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("n_shared"))
    )


def interdup_score(
    df: DataFrame, text_col: str, id_col: str, n: int = 13,
    hash_grams: bool = False,
) -> DataFrame:
    """Within-corpus duplication score: for each document, how much of it
    appears verbatim elsewhere in the SAME corpus.

    Web-scale curation pipelines (RefinedWeb, Dolma) track this as a
    quality signal distinct from pairwise near-dup detection: a page can
    be 40% boilerplate shared with thousands of other pages without any
    single page being a near-duplicate of it.  Per document we report

        n_grams  = distinct character n-grams of the normalized text
        n_shared = how many of those occur in >= 2 documents
        dup_frac = n_shared / n_grams

    Plan shape (all keyed aggregations — never all-pairs, and NO join
    of the full gram stream): explode grams ONCE -> distinct (id, gram),
    materialized with an eager localCheckpoint so both consumers read
    the shuffle output instead of re-running the explode subtree, then

        n_grams  per id: groupBy(id).count() over the gram stream
        n_unique per id: groupBy(gram).agg(count, min(id)) — map-side
                         partial agg, so a boilerplate gram shared by
                         millions of docs combines per-partition — keep
                         rows with count==1 (min(id) IS the sole owner,
                         no carried id set) -> groupBy(owner).count()
        n_shared = n_grams - n_unique      (identical to counting grams
                                            with n_docs >= 2 directly)

    The r8 plan joined per-gram doc counts back onto the full gram
    stream; this identity replaces that widest-stream join with a second
    keyed aggregate whose output is one row per UNIQUE gram — strictly
    less shuffled data, same skew safety.  ``hash_grams=True`` shuffles
    64-bit xxhash64 keys instead of raw ~n-byte strings (the production
    path at 100 TB: ~8 bytes/gram on the wire; collision odds at 2^64
    are negligible for a dup-FRACTION signal) — default False for
    bit-exact oracle parity on raw grams.

    Documents with no n-gram (normalized length < n) produce no row.
    ``dup_frac`` is a double computed as exactly one IEEE division of
    two integer-valued casts, portable bit-for-bit across engines.
    """
    grams = char_ngrams(df, text_col, id_col, n).distinct()
    if hash_grams:
        grams = grams.select(id_col, F.xxhash64("gram").alias("gram"))
    grams = pin(grams)
    per_id = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    unique_per_id = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("__owner"))
        .filter(F.col("n_docs") == 1)
        .groupBy("__owner")
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )
    return (
        per_id.join(
            unique_per_id, per_id[id_col] == unique_per_id["__owner"], "left"
        )
        .select(
            id_col,
            "n_grams",
            (
                F.col("n_grams") - F.coalesce(F.col("n_unique"), F.lit(0))
            ).alias("n_shared"),
        )
        .select(
            id_col,
            "n_grams",
            "n_shared",
            (
                F.col("n_shared").cast("double") / F.col("n_grams").cast("double")
            ).alias("dup_frac"),
        )
    )
