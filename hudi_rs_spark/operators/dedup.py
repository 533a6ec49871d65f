"""Deduplication operators for large-scale training-data pipelines.

All variants are DataFrame -> DataFrame and built from JVM-side functions
(no Python in the hot path), so they scale by partitioning on the dedup
key. Cross-document similarity work is always *blocked* first (LSH bands /
buckets) so the candidate-pair join is an equi-join — never an O(n^2)
cross join.

Hash choice: md5 (built-in in both Spark and DuckDB) keeps every operator
oracle-checkable; at production scale xxhash64 is a drop-in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalized(text: Column) -> Column:
    """Canonical text form for fuzzy matching: lowercase, strip
    non-alphanumerics, collapse whitespace."""
    c = F.lower(text)
    c = F.regexp_replace(c, "[^a-z0-9 ]", "")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup by content hash; the survivor is the min id.

    One shuffle on the 16-byte digest (uniform — no skew).
    Returns (fingerprint, keep_id, dup_count).
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def char_shingles(text: Column, k: int = 3) -> Column:
    """Distinct character k-grams of the normalized text (JVM-side:
    sequence + transform + array_distinct)."""
    norm = normalized(text)
    n = F.greatest(F.length(norm) - (k - 1), F.lit(1))
    idx = F.sequence(F.lit(1), n)
    return F.array_distinct(F.transform(idx, lambda i: norm.substr(i, F.lit(k))))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.6,
    block_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Near-duplicate pairs by k-gram Jaccard similarity.

    Candidate generation is blocked on ``block_cols`` (e.g. language +
    length bucket) so the pair join is an equi-join; at 100 TB the block
    key bounds each join partition. Jaccard itself is
    |intersect| / |union| over distinct shingle arrays — all built-ins.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    """
    spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    sh = spread.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in block_cols],
        char_shingles(F.col(text_col), k).alias("shingles"),
    )
    a = sh.select(
        F.col("id").alias("id_a"),
        *[F.col(c).alias(f"ba_{c}") for c in block_cols],
        F.col("shingles").alias("sh_a"),
    )
    b = sh.select(
        F.col("id").alias("id_b"),
        *[F.col(c).alias(f"bb_{c}") for c in block_cols],
        F.col("shingles").alias("sh_b"),
    )
    cond = F.col("id_a") < F.col("id_b")
    for c in block_cols:
        cond = cond & (F.col(f"ba_{c}") == F.col(f"bb_{c}"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter.cast("double") / union.cast("double")
    from hudi_rs_spark.functions.numeric import microf

    pairs = (
        a.join(b, cond)
        .filter(jac >= threshold)
        .select("id_a", "id_b", microf(jac).alias("jaccard"))
    )
    return pairs


def word_shingles(text: Column, n: int = 2) -> Column:
    """Distinct word n-grams (default bigrams) of the normalized text.

    Word shingles discriminate far better than char k-grams on
    small-vocabulary corpora (char 3-grams of such text are nearly
    identical across documents, which collapses MinHash buckets and makes
    LSH candidate generation quadratic)."""
    toks = F.split(normalized(text), " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.try_element_at(toks, i + j) for j in range(n)]
            ),
        )
    )


def _seeded_md5(seed: int):
    """Single-parameter lambda factory for F.transform — a two-parameter
    lambda would be called as (element, index) by pyspark, silently
    shadowing the captured seed."""

    def f(s: Column) -> Column:
        return F.md5(F.concat(s, F.lit(f"#{seed}")))

    return f


def minhash_signature(text: Column, k: int = 2, num_hashes: int = 16) -> Column:
    """MinHash signature as an array of hex-string minima over word
    k-gram shingles.

    min over md5(shingle || seed) is a valid permutation-min approximation;
    string minima keep it portable to the SQL oracle. Vectorized, JVM-side.
    """
    sh = word_shingles(text, k)
    return F.array(
        *[F.array_min(F.transform(sh, _seeded_md5(i))) for i in range(num_hashes)]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 2,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """MinHash + LSH banding: docs sharing any band bucket become candidate
    pairs. shingle -> minhash -> band -> bucket-join (equi-join on the band
    hash; the only shuffle is on bucket keys).

    Returns distinct (id_a, id_b) candidate pairs, id_a < id_b.
    """
    rows_per_band = num_hashes // bands
    # Parallelize before the heavy shingle/hash work: a small corpus often
    # arrives as one input split, and minhash cost is per-document, so
    # spread rows across the cluster first (cheap: shuffles raw text once).
    spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    # Compute the shingle array ONCE as a materialized projection, then
    # derive the num_hashes minima from that column (avoids inlining the
    # shingle expression into every hash and keeps codegen small).
    sh_df = spread.select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col), k).alias("sh")
    )
    mh = sh_df.select(
        "id",
        *[
            F.array_min(F.transform("sh", _seeded_md5(i))).alias(f"m{i}")
            for i in range(num_hashes)
        ],
    )
    band_cols = [
        F.md5(
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[F.col(f"m{b * rows_per_band + r}") for r in range(rows_per_band)],
            )
        ).alias("bucket")
        for b in range(bands)
    ]
    buckets = mh.select(
        "id", F.explode(F.array(*band_cols)).alias("bucket")
    ).distinct()
    a = buckets.select(F.col("id").alias("id_a"), "bucket")
    b = buckets.select(F.col("id").alias("id_b"), "bucket")
    return (
        a.join(b, ["bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash64(text: Column) -> Column:
    """64-bit SimHash over word tokens, entirely with built-ins.

    Each token hashes to 64 bits (xxhash64); for each bit position the
    weighted vote is summed over tokens; the sign vector is the simhash.
    Implemented as: explode-free aggregate over the token array per row.
    """
    tokens = F.array_distinct(F.split(normalized(text), " "))
    # For each bit b: count tokens with bit set minus tokens with bit unset.
    bit_votes = [
        F.aggregate(
            tokens,
            F.lit(0),
            lambda acc, t: acc
            + F.when(F.shiftright(F.xxhash64(t), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        for b in range(64)
    ]
    out = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    for b, vote in enumerate(bit_votes):
        # shiftleft handles bit 63 (sign bit) without Python long overflow
        out = out + F.when(vote > 0, F.shiftleft(one, b)).otherwise(F.lit(0).cast("long"))
    return out


def simhash_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 8
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on 16-bit
    chunks: two 64-bit hashes within Hamming distance d<=3 per 4-way split
    must share at least one exact 16-bit chunk (pigeonhole), making the
    candidate join an equi-join on (chunk_idx, chunk_value).
    """
    spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    h = spread.select(F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sim"))
    chunks = h.select(
        "id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        F.shiftright("sim", i * 16).bitwiseAND(F.lit(0xFFFF)).alias("chunk"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("id", "sim", "c.chunk_idx", "c.chunk")
    a = chunks.select(
        F.col("id").alias("id_a"), F.col("sim").alias("sim_a"), "chunk_idx", "chunk"
    )
    b = chunks.select(
        F.col("id").alias("id_b"), F.col("sim").alias("sim_b"), "chunk_idx", "chunk"
    )
    cand = (
        a.join(b, ["chunk_idx", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sim_a", "sim_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
