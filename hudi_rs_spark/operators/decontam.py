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


def _bloom_probe_arrays(hashes, m_bits: int, k: int):
    """Yield ``k`` (byte_index, bit_mask) numpy array pairs for the
    double-hashing scheme pos_i = (h1 + i*h2) mod m_bits, where h1/h2 are
    the two 32-bit halves of one 64-bit gram hash (Kirsch & Mitzenmacher
    2006: two hash functions simulate k with no independence loss for
    Bloom filters). ``m_bits`` must be a power of two so the modulo is a
    mask. ``hashes`` is a uint64 ndarray.
    """
    import numpy as np

    mask = np.uint64(m_bits - 1)
    h1 = hashes >> np.uint64(32)
    h2 = (hashes & np.uint64(0xFFFFFFFF)) | np.uint64(1)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) & mask
        yield (pos >> np.uint64(3)).astype(np.int64), (
            np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
        )


def build_gram_bloom(grams: DataFrame, m_bits: int, k: int) -> bytes:
    """Fold a (gram) DataFrame into one Bloom bitset of ``m_bits`` bits.

    Distributed build: each partition reduces its grams to ONE
    ``m_bits/8``-byte partial bitset inside a single mapInPandas pass
    (the 64-bit gram hash is computed JVM-side with ``xxhash64``), and
    the driver ORs the O(partitions) partials. Nothing proportional to
    the gram count ever reaches the driver, so the build holds for eval
    sets far past collect() range.
    """
    import numpy as np

    if m_bits <= 0 or m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a positive power of two, got {m_bits}")
    n_bytes = m_bits // 8
    hashed = grams.select(F.xxhash64("gram").alias("_h"))

    def fold(batches):
        import pandas as pd

        bits = np.zeros(n_bytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            hv = pdf["_h"].to_numpy(dtype=np.int64).view(np.uint64)
            for byte_idx, bit_mask in _bloom_probe_arrays(hv, m_bits, k):
                np.bitwise_or.at(bits, byte_idx, bit_mask)
        if seen:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    out = np.zeros(n_bytes, dtype=np.uint8)
    for row in hashed.mapInPandas(fold, schema="bits binary").collect():
        out |= np.frombuffer(row.bits, dtype=np.uint8)
    return out.tobytes()


def decontaminate_bloom(
    df: DataFrame,
    text_col: str,
    id_col: str,
    eval_pred: Column,
    n: int = 13,
    bits_per_gram: int = 16,
    k: int = 6,
) -> DataFrame:
    """``decontaminate`` with a broadcast Bloom prefilter — the 100 TB
    plan shape, returning the EXACT same rows.

    ``decontaminate`` broadcast-joins the raw eval gram STRINGS against
    every corpus gram: at 16 bits/gram a 10^8-gram eval blocklist is a
    ~200 MB bitset where the raw distinct strings are multiple GB, past
    broadcast range. Here the corpus gram stream is probed map-side
    against the broadcast bitset by an Arrow-vectorized pandas UDF
    (pure numpy bit math on JVM-computed xxhash64 keys — no Python
    string hashing), and only the ~FP-rate survivors reach the exact
    confirm join, which removes Bloom false positives. Exactness is why
    the confirm join stays: the operator's contract (and its oracle) is
    identical to ``decontaminate``; the bitset only bounds how much of
    the corpus stream the join ever sees. With bits_per_gram=16, k=6
    the FP rate is ~0.1%, so the confirm join's input is ~(true hits +
    0.1% of corpus grams) — broadcastable even when the raw blocklist
    would not be.

    Returns (id, n_shared) for contaminated non-eval docs only.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    spark = df.sparkSession
    eval_grams = (
        char_ngrams(df.filter(eval_pred), text_col, id_col, n)
        .select("gram")
        .distinct()
    )
    eval_grams = pin(eval_grams)
    n_eval = eval_grams.count()
    m_bits = 1024
    while m_bits < n_eval * bits_per_gram:
        m_bits <<= 1
    bitset = build_gram_bloom(eval_grams, m_bits, k)
    bits_bc = spark.sparkContext.broadcast(bitset)

    def _maybe_contaminated(h):
        bits = np.frombuffer(bits_bc.value, dtype=np.uint8)
        hv = h.to_numpy(dtype=np.int64).view(np.uint64)
        ok = np.ones(len(hv), dtype=bool)
        for byte_idx, bit_mask in _bloom_probe_arrays(hv, m_bits, k):
            ok &= (bits[byte_idx] & bit_mask) != 0
        return pd.Series(ok)

    # real annotation objects (module uses `from __future__ import
    # annotations`, and string hints can't resolve a local `pd`)
    _maybe_contaminated.__annotations__ = {"h": pd.Series, "return": pd.Series}
    maybe_contaminated = pandas_udf("boolean")(_maybe_contaminated)

    train_grams = char_ngrams(df.filter(~eval_pred), text_col, id_col, n)
    survivors = train_grams.filter(
        maybe_contaminated(F.xxhash64("gram"))
    )
    return (
        survivors.join(F.broadcast(eval_grams), "gram")
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
