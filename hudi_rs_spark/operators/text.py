"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All built-in-function pipelines (JVM-side), so
they run at scan speed and scale linearly with partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hudi_rs_spark.functions.numeric import microf
from hudi_rs_spark.operators.dedup import normalized

TOKEN_RE = "[A-Za-z0-9]+"

# Tiny per-language stopword marker sets for the n-gram/stopword-voting
# language heuristic. Deliberately small and ASCII so the same logic is
# expressible in the DuckDB oracle.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "with"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit"),
    "fr": ("le", "la", "les", "et", "est", "une", "que", "pour"),
    "es": ("el", "los", "las", "es", "una", "que", "por", "para"),
}


def token_count(text: Column) -> Column:
    """Whitespace/alnum token count via regexp (vectorized)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_RE), F.lit(0)))


def approx_bpe_token_count(text: Column) -> Column:
    """BPE-ish token estimate: words + punctuation marks, long words count
    ceil(len/4) subword units — a common serving-side approximation."""
    words = F.regexp_extract_all(normalized(text), F.lit("[a-z0-9]+"), F.lit(0))
    word_units = F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("int"),
    )
    punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), F.lit(0)))
    return word_units + punct


def lang_votes(text: Column) -> dict[str, Column]:
    """Per-language stopword hit counts over the token set."""
    toks = F.regexp_extract_all(F.lower(text), F.lit("[a-z]+"), F.lit(0))
    votes = {}
    for lang, markers in LANG_MARKERS.items():
        votes[lang] = F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(m) for m in markers])))
    return votes


def lang_id(text: Column) -> Column:
    """argmax over language votes; deterministic tie-break by language code
    order; 'und' (undetermined) when no marker hits."""
    votes = lang_votes(text)
    best = F.greatest(*votes.values())
    out = F.lit("und")
    # reversed so earlier language codes win ties via later .when override
    for lang in sorted(votes, reverse=True):
        out = F.when((votes[lang] > 0) & (votes[lang] == best), F.lit(lang)).otherwise(out)
    return out


def quality_features(text: Column) -> dict[str, Column]:
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    n_upper = F.length(F.regexp_replace(text, "[^A-Z]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    n_tokens = token_count(text)
    mean_word_len = F.when(
        n_tokens > 0, n_alpha.cast("double") / n_tokens.cast("double")
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "alpha_ratio": microf(n_alpha.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")),
        "upper_ratio": microf(n_upper.cast("double") / F.greatest(n_alpha, F.lit(1)).cast("double")),
        "punct_ratio": microf(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")),
        "mean_word_len": microf(mean_word_len),
    }


def quality_score(text: Column) -> Column:
    """Heuristic [0,1] quality score from length/punct/alpha ratios.
    Piecewise-linear so the oracle SQL reproduces it exactly."""
    f = quality_features(text)
    len_score = F.least(f["n_tokens"].cast("double") / F.lit(50.0), F.lit(1.0))
    alpha_score = f["alpha_ratio"]
    punct_penalty = F.least(f["punct_ratio"] * 5.0, F.lit(1.0))
    score = (len_score * 0.4 + alpha_score * 0.5 - punct_penalty * 0.2 + 0.3)
    return microf(F.greatest(F.least(score, F.lit(1.0)), F.lit(0.0)))


def fingerprint(text: Column) -> Column:
    """Normalized-content fingerprint (md5 of canonical form). Documents
    with equal fingerprints are near-identical modulo case/punct."""
    return F.md5(normalized(text))


def text_profile(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One-pass per-document profile: tokens, quality, language, fingerprint."""
    t = F.col(text_col)
    feats = quality_features(t)
    return df.select(
        F.col(id_col),
        feats["n_tokens"].alias("n_tokens"),
        approx_bpe_token_count(t).alias("approx_bpe_tokens"),
        feats["alpha_ratio"].alias("alpha_ratio"),
        feats["punct_ratio"].alias("punct_ratio"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("pred_lang"),
        fingerprint(t).alias("fingerprint"),
    )


def repetition_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Word-level repetition signals (Gopher/C4-style quality filters):

    - ``distinct_ratio``  — distinct words / total words
    - ``top_word_ratio``  — occurrences of the most frequent word / total
    - ``dup_bigram_ratio`` — 1 - distinct bigrams / total bigrams

    Highly repetitive machine-generated or boilerplate text scores low
    on the first and high on the last two.

    Plan shape: posexplode words once, then partial-aggregated groupBys
    and one window pass — every shuffle is keyed by the doc id, uniform.
    No higher-order-function lambdas (adjacent-word pairing via lead()
    avoids re-evaluating the split per element — the HOF inlining trap).
    Ratios are explicit DOUBLE casts dividing in a fixed order so the
    SQL oracle computes bit-identical IEEE results.
    """
    from pyspark.sql.window import Window

    wp = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w"),
    )
    per_word = wp.groupBy("id", "w").agg(F.count(F.lit(1)).alias("c"))
    per_doc = per_word.groupBy("id").agg(
        F.sum("c").cast("bigint").alias("n_words"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    win = Window.partitionBy("id").orderBy("pos")
    bi = (
        wp.withColumn("nxt", F.lead("w").over(win))
        .filter(F.col("nxt").isNotNull())
        .select("id", F.concat_ws(" ", "w", "nxt").alias("bg"))
        .groupBy("id")
        .agg(F.count_distinct(F.col("bg")).cast("bigint").alias("n_distinct_bigrams"))
    )
    joined = per_doc.join(bi, "id", "left")
    n_bigrams = F.col("n_words") - F.lit(1)
    return joined.select(
        F.col("id"),
        F.col("n_words"),
        F.col("n_distinct"),
        (F.col("n_distinct").cast("double") / F.col("n_words").cast("double")).alias(
            "distinct_ratio"
        ),
        (F.col("top_c").cast("double") / F.col("n_words").cast("double")).alias(
            "top_word_ratio"
        ),
        F.when(n_bigrams <= 0, F.lit(0.0))
        .otherwise(
            F.lit(1.0)
            - F.coalesce(F.col("n_distinct_bigrams"), F.lit(0)).cast("double")
            / n_bigrams.cast("double")
        )
        .alias("dup_bigram_ratio"),
    )


GOPHER_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")


def chunk_with_overlap(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Split each document into fixed-size token windows with overlap —
    the standard training-data chunking step (context-window packing's
    upstream). One narrow projection, one posexplode, zero shuffles;
    every expression is a JVM array function inside whole-stage codegen
    (split / sequence / slice / array_join), so chunking 100 TB is a
    pure map with output ≈ input·(1 + overlap/stride).

    Output: (id, chunk_id, chunk_text, n_tokens), chunk_id 0-based.
    The last chunk may be shorter; every doc yields at least one chunk.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(words)
    n_chunks = F.greatest(
        F.lit(1),
        F.floor(
            (n - F.lit(overlap) + F.lit(stride) - 1) / F.lit(stride)
        ).cast("int"),
    )
    w = df.select(
        F.col(id_col).alias("id"),
        words.alias("__w"),
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias(
            "chunk_id", "__i"
        ),
    )
    piece = F.slice(
        F.col("__w"), F.col("chunk_id") * stride + 1, chunk_tokens
    )
    return w.select(
        "id",
        "chunk_id",
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).alias("n_tokens"),
    )


def gopher_rules(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021 §A1.1 heuristics, the
    deterministic subset): word-count bounds, mean word length in
    [3, 10], >=80% of words containing an alphabetic character, and at
    least 2 distinct common stop words present. All integer arithmetic
    (mean word length as floor-micros) so results hash identically
    across engines; a single projection over one split — no shuffle,
    no UDF.

    Output: (id, n_words, mean_wlen_micro, alpha_words, stop_hits,
    keep)."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(F.col(id_col).alias("id"), words.alias("__w"))
    n = F.size(F.col("__w"))
    sum_len = F.aggregate(
        F.col("__w"), F.lit(0), lambda acc, w: acc + F.length(w)
    )
    alpha = F.size(F.filter(F.col("__w"), lambda w: w.rlike("[A-Za-z]")))
    stop_hits = sum(
        F.array_contains(F.col("__w"), s).cast("int")
        for s in GOPHER_STOPWORDS
    )
    out = base.select(
        "id",
        n.alias("n_words"),
        ((sum_len.cast("bigint") * 1_000_000) / n)
        .cast("bigint").alias("mean_wlen_micro"),
        alpha.alias("alpha_words"),
        stop_hits.alias("stop_hits"),
    )
    keep = (
        F.col("n_words").between(50, 100_000)
        & F.col("mean_wlen_micro").between(3_000_000, 10_000_000)
        & (F.col("alpha_words") * 10 >= F.col("n_words") * 8)
        & (F.col("stop_hits") >= 2)
    )
    return out.withColumn("keep", keep)
