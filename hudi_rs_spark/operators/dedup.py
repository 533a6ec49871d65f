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

from hudi_rs_spark.operators.pin import pin


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


def char_shingles(norm_col: Column, k: int = 3) -> Column:
    """Distinct character k-grams of an ALREADY-NORMALIZED column.

    ``norm_col`` must be a plain attribute (a projected column behind a
    plan boundary), NOT the normalization expression itself: the substr
    lambda reads it once per element, and an inlined expression would be
    re-evaluated per element (the higher-order-function trap)."""
    n = F.greatest(F.length(norm_col) - (k - 1), F.lit(1))
    idx = F.sequence(F.lit(1), n)
    return F.array_distinct(F.transform(idx, lambda i: norm_col.substr(i, F.lit(k))))


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
    # normalize -> REPARTITION (plan boundary so CollapseProject cannot
    # inline the regex pipeline into the per-element substr lambda) ->
    # shingle from the materialized attribute
    normed = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in block_cols],
        normalized(F.col(text_col)).alias("__norm"),
    ).repartition(df.sparkSession.sparkContext.defaultParallelism)
    sh = normed.select(
        "id",
        *block_cols,
        char_shingles(F.col("__norm"), k).alias("shingles"),
    )
    # Materialize before the self-join (no cross-side exchange reuse):
    # the normalize+shingle pass runs once; the join shuffles these same
    # arrays regardless, so no extra data volume is introduced.
    sh = pin(sh)
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
    """Distinct word bigrams of the normalized text.

    Word shingles discriminate far better than char k-grams on
    small-vocabulary corpora (char 3-grams of such text are nearly
    identical across documents, which collapses MinHash buckets and makes
    LSH candidate generation quadratic).

    PERF: built with zip_with over two slices — NEVER index the token
    array inside a transform() lambda: any outer expression referenced in
    a higher-order-function lambda is re-evaluated per element (measured
    25x slower). Single-token docs shingle to the token itself, matching
    the SQL oracle's concat_ws null-skip behavior.
    """
    if n != 2:
        raise ValueError("word_shingles supports bigrams (n=2)")
    toks = F.split(normalized(text), " ")
    m = F.size(toks)
    zipped = F.zip_with(
        F.slice(toks, 1, m - 1),
        F.slice(toks, 2, m - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.array_distinct(F.when(m >= 2, zipped).otherwise(toks))


# modulus for the derived minhash permutations (largest prime < 2^32)
MINHASH_PRIME = 4294967291


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
    # Explode shingles to rows so the shingle expression evaluates ONCE
    # per document (Catalyst's CollapseProject would otherwise re-inline
    # it into all num_hashes columns — measured 10x slower), then take
    # per-seed minima as a partial-aggregated groupBy: the shuffle carries
    # only num_hashes values per document.
    #
    # ONE md5 per shingle; the num_hashes permutations are Carter-Wegman
    # style derivations (hi*(2i+1) + lo*(i+7) mod p) over the digest's two
    # 32-bit halves — exact BIGINT arithmetic both Spark and DuckDB
    # evaluate identically (operands < 2^38, safe under ANSI mode). This
    # cut the md5 count 16x and the query wall time ~2x.
    sh_df = spread.select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col), k).alias("sh")
    )
    exploded = sh_df.select("id", F.explode("sh").alias("s"))
    digest = F.md5(F.col("s"))
    halves = exploded.select(
        "id",
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("long").alias("hi"),
        F.conv(F.substring(digest, 9, 8), 16, 10).cast("long").alias("lo"),
    )
    # the permutation arithmetic lives INSIDE the aggregate: a Project
    # does not collapse into Aggregate expressions, so md5/conv stay
    # single-evaluation per row (putting the 16 h_i in an intermediate
    # projection re-inlines the md5 pipeline into each — measured 2x
    # slower), and map-side partial min keeps the shuffle at 16 longs/doc.
    P = MINHASH_PRIME
    mh = halves.groupBy("id").agg(
        *[
            F.min((F.col("hi") * (2 * i + 1) + F.col("lo") * (i + 7)) % P).alias(f"m{i}")
            for i in range(num_hashes)
        ]
    )
    band_cols = [
        F.md5(
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[
                    F.col(f"m{b * rows_per_band + r}").cast("string")
                    for r in range(rows_per_band)
                ],
            )
        ).alias("bucket")
        for b in range(bands)
    ]
    buckets = mh.select(
        "id", F.explode(F.array(*band_cols)).alias("bucket")
    ).distinct()
    # Materialize the bucket index before the self-join: Spark does not
    # reuse the exchange across the two join sides (verified NO
    # ReusedExchange in the physical plan), so without this the whole
    # shingle->md5->minhash subtree executes twice — at scale, two full
    # corpus scans. The checkpointed frame is the LSH index itself
    # (bands rows per doc, two small columns), far smaller than the
    # corpus it indexes.
    buckets = pin(buckets)
    a = buckets.select(F.col("id").alias("id_a"), "bucket")
    b = buckets.select(F.col("id").alias("id_b"), "bucket")
    return (
        a.join(b, ["bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def md5_hash64(col: Column) -> Column:
    """Deterministic 64-bit hash from the first 16 hex chars of md5.

    Exists so simhash is oracle-checkable: md5 is the one hash both Spark
    and DuckDB implement identically. Assembled as (hi32 << 32) | lo32 —
    bitwiseOR keeps it overflow-free under ANSI mode (the shifted value's
    low 32 bits are zero). xxhash64 is the faster production variant (one
    JVM hash call vs md5 + two conv parses)."""
    d = F.md5(col)
    hi = F.conv(F.substring(d, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(d, 9, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def simhash64_df(
    df: DataFrame, id_col: str, text_col: str, token_hash: str = "xxhash64"
) -> DataFrame:
    """64-bit SimHash per document: (id, sim).

    Each distinct token hashes to 64 bits; per bit position the
    vote is (+1 set / -1 unset) summed over tokens; the sign vector is the
    simhash. Tokens are EXPLODED to rows so the token hash runs once per
    token; the 64 bit-votes are partial-aggregated sums (the shuffle
    carries 64 ints per document). Never fold over the token array with
    F.aggregate — outer expressions inline into the lambda and
    re-evaluate per element.

    token_hash: "xxhash64" (production) or "md5" (oracle-checkable,
    see md5_hash64).
    """
    spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    toks = spread.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(F.split(normalized(F.col(text_col)), " "))).alias("t"),
    )
    hash_fn = F.xxhash64 if token_hash == "xxhash64" else md5_hash64
    hashed = toks.select("id", hash_fn(F.col("t")).alias("h"))
    votes = hashed.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(64)
        ]
    )
    one = F.lit(1).cast("long")
    sim = F.lit(0).cast("long")
    for b in range(64):
        # shiftleft handles bit 63 (sign bit) without Python long overflow
        sim = sim + F.when(F.col(f"v{b}") > 0, F.shiftleft(one, b)).otherwise(
            F.lit(0).cast("long")
        )
    return votes.select("id", sim.alias("sim"))


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 8,
    token_hash: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on 16-bit
    chunks: two 64-bit hashes within Hamming distance d<=3 per 4-way split
    must share at least one exact 16-bit chunk (pigeonhole), making the
    candidate join an equi-join on (chunk_idx, chunk_value).

    For max_hamming <= 3 the blocking is LOSSLESS (3 flipped bits touch at
    most 3 of the 4 chunks), so the result equals the full O(n^2)
    hamming<=3 pair set — which is what the SQL oracle computes.
    """
    h = simhash64_df(df, id_col, text_col, token_hash=token_hash)
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
    # Materialize before the self-join (no cross-side exchange reuse):
    # otherwise the token-hash + bit-vote pipeline runs twice. 4 small
    # rows per doc.
    chunks = pin(chunks)
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


def substring_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 8,
    max_bucket_docs: int = 64,
) -> DataFrame:
    """EXACT-substring duplicate pairs: documents sharing any verbatim
    run of ``window`` normalized words (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better" — the containment
    complement to the similarity-based dedups: a 50-word passage pasted
    into an otherwise-unrelated document scores near zero Jaccard but
    is exactly what substring dedup must catch).

    Plan (all built-ins, stride-1 windows so shared runs at ARBITRARY
    offsets align): normalize -> word split (materialized attribute
    behind a repartition boundary — the slice lambda would re-evaluate
    an inlined pipeline per element) -> md5 per window -> posexplode ->
    distinct (doc, hash) with first position -> bucket count on the
    hash -> self-equi-join on the hash. At 100 TB: shingle volume =
    total corpus tokens (one row per word — the same order as the
    tokenize pass everything else already pays), two hash-partitioned
    shuffles, and the join is blocked BY CONSTRUCTION (a bucket = one
    exact 8-word string). ``max_bucket_docs`` drops boilerplate windows
    shared by more than N docs (licenses, headers) — Lee et al. filter
    these too; the cap is part of the operator contract, applied
    identically in the DuckDB oracle, NOT a silent truncation. The
    suffix-array formulation is the single-machine analog; this is its
    shuffle-native equivalent.

    Returns (id_a, id_b, shared_windows, pos_a, pos_b): the number of
    distinct shared windows and the first (1-based word) position of a
    shared window in each document.
    """
    spark = df.sparkSession
    # normalize + split BEFORE the repartition boundary: `words` must be
    # a materialized attribute when the slice lambda reads it, or
    # CollapseProject inlines the regex+split pipeline into the
    # per-element lambda (the higher-order-function trap: O(words^2)
    # splits per document)
    tok = df.select(
        F.col(id_col).alias("id"),
        F.split(normalized(F.col(text_col)), " ").alias("words"),
    ).repartition(spark.sparkContext.defaultParallelism)
    n = F.size("words")
    idx = F.when(
        n >= window, F.sequence(F.lit(1), n - (window - 1))
    ).otherwise(F.array().cast("array<int>"))
    hashes = F.transform(
        idx, lambda i: F.md5(F.concat_ws(" ", F.slice("words", i, window)))
    )
    sh = (
        tok.select("id", F.posexplode(hashes).alias("p0", "h"))
        .groupBy("id", "h")
        .agg((F.min("p0") + 1).alias("pos"))
    )
    # sh feeds BOTH the bucket count and the join probe: without this
    # pin the whole normalize/split/md5/explode/groupBy pipeline — the
    # operator's dominant pass — executed twice (r14; the later
    # pin(shf) only stopped the PAIR join from making it four).
    sh = pin(sh)
    buckets = (
        sh.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter((F.col("c") >= 2) & (F.col("c") <= max_bucket_docs))
        .select("h")
    )
    shf = sh.join(buckets, "h")
    shf = pin(shf)  # one bucket-filter join, not one per pair side
    a = shf.select(
        F.col("h"), F.col("id").alias("id_a"), F.col("pos").alias("pa")
    )
    b = shf.select(
        F.col("h"), F.col("id").alias("id_b"), F.col("pos").alias("pb")
    )
    return (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("shared_windows"),
            F.min("pa").alias("pos_a"),
            F.min("pb").alias("pos_b"),
        )
    )
