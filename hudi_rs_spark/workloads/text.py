"""Text-analysis workload over documents, oracle-checked.

The oracle SQL re-implements the exact formulas in operators/text.py;
both engines do identical double arithmetic, so rounded outputs match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hudi_rs_spark.operators import text as T
from hudi_rs_spark.workloads import QuerySpec, register
from hudi_rs_spark.workloads.dedup import SQL_NORM
from hudi_rs_spark.workloads.tables import load


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        T.token_count(t).alias("n_tokens"),
        T.approx_bpe_token_count(t).cast("int").alias("approx_bpe_tokens"),
    ).orderBy("doc_id")


TOKEN_SQL = """
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '[A-Za-z0-9]+')) AS INTEGER) AS n_tokens,
       CAST(
         CAST(list_sum(list_transform(
             regexp_extract_all(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), '[a-z0-9]+'),
             w -> CAST(ceil(length(w) / 4.0) AS INTEGER))) AS INTEGER)
         + length(regexp_extract_all(text, '[^\\w\\s]'))
       AS INTEGER) AS approx_bpe_tokens
FROM documents
ORDER BY doc_id
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    feats = T.quality_features(t)
    return d.select(
        "doc_id",
        feats["alpha_ratio"].alias("alpha_ratio"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["mean_word_len"].alias("mean_word_len"),
        T.quality_score(t).alias("quality"),
    ).orderBy("doc_id")


QUALITY_SQL = """
WITH f AS (
  SELECT doc_id,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper,
         length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
         length(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tokens
  FROM documents
),
r AS (
  SELECT doc_id, n_tokens,
         floor(CAST(n_alpha AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE) * 1000000.0) / 1000000.0 AS alpha_ratio,
         floor(CAST(n_punct AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE) * 1000000.0) / 1000000.0 AS punct_ratio,
         floor((CASE WHEN n_tokens > 0 THEN CAST(n_alpha AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END) * 1000000.0) / 1000000.0 AS mean_word_len
  FROM f
)
SELECT doc_id, alpha_ratio, punct_ratio, mean_word_len,
       floor(greatest(least(
           least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * 0.4
           + alpha_ratio * 0.5
           - least(punct_ratio * 5.0, 1.0) * 0.2
           + 0.3, 1.0), 0.0) * 1000000.0) / 1000000.0 AS quality
FROM r
ORDER BY doc_id
"""


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", T.lang_id(F.col("text")).alias("pred_lang")).orderBy("doc_id")


def _votes_sql(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in T.LANG_MARKERS[lang])
    return (
        f"length(list_intersect(list_distinct(regexp_extract_all(lower(text), '[a-z]+')),"
        f" [{markers}])) AS v_{lang}"
    )


LANG_SQL = f"""
WITH v AS (
  SELECT doc_id,
         {_votes_sql("en")},
         {_votes_sql("de")},
         {_votes_sql("fr")},
         {_votes_sql("es")}
  FROM documents
)
SELECT doc_id,
       CASE WHEN v_de > 0 AND v_de = greatest(v_en, v_de, v_fr, v_es) THEN 'de'
            WHEN v_en > 0 AND v_en = greatest(v_en, v_de, v_fr, v_es) THEN 'en'
            WHEN v_es > 0 AND v_es = greatest(v_en, v_de, v_fr, v_es) THEN 'es'
            WHEN v_fr > 0 AND v_fr = greatest(v_en, v_de, v_fr, v_es) THEN 'fr'
            ELSE 'und' END AS pred_lang
FROM v
ORDER BY doc_id
"""


def text_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents grouped by normalized-content fingerprint; surfaces exact
    near-duplicate clusters (case/punct-insensitive)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(T.fingerprint(F.col("text")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc"))
        .filter(F.col("n_docs") > 1)
        .orderBy("fp")
    )


FP_SQL = f"""
SELECT md5({SQL_NORM}) AS fp, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS first_doc
FROM documents
GROUP BY 1
HAVING count(*) > 1
ORDER BY fp
"""


def _with_synthetic_pii(d: DataFrame) -> DataFrame:
    """Deterministically inject PII-shaped spans keyed on doc_id.

    The synthetic corpus contains no digits or '@' at all, so detection
    over raw text is degenerate; the same augmentation expression runs
    in both engines (PII_AUG_SQL) and the detector is exercised on text
    where ~1/7 of docs carry an email, ~1/11 a phone, ~1/13 an IP."""
    i = F.col("doc_id")
    email = F.when(
        i % 7 == 0,
        F.concat(F.lit(" contact user"), i.cast("string"), F.lit("@example.com now")),
    ).otherwise(F.lit(""))
    phone = F.when(
        i % 11 == 0,
        F.concat(
            F.lit(" call +1 "),
            F.lpad(((i * 7) % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad(((i * 13) % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        i % 13 == 0,
        F.concat(
            F.lit(" from 10."),
            (i % 256).cast("string"),
            F.lit("."),
            ((i * 3) % 256).cast("string"),
            F.lit("."),
            ((i * 5) % 256).cast("string"),
        ),
    ).otherwise(F.lit(""))
    return d.withColumn("text", F.concat(F.col("text"), email, phone, ip))


def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection counts + typed redaction per document
    (operators/pii.py) over the deterministically augmented text."""
    from hudi_rs_spark.operators.pii import pii_scrub

    d = _with_synthetic_pii(load(spark, sf_dir, "documents"))
    return pii_scrub(d, "text", "doc_id").orderBy("doc_id")


PII_AUG_SQL = """
text
|| CASE WHEN doc_id % 7 = 0
        THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
        ELSE '' END
|| CASE WHEN doc_id % 11 = 0
        THEN ' call +1 ' || lpad(CAST((doc_id * 7) % 1000 AS VARCHAR), 3, '0')
             || '-' || lpad(CAST((doc_id * 13) % 10000 AS VARCHAR), 4, '0')
        ELSE '' END
|| CASE WHEN doc_id % 13 = 0
        THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
             || '.' || CAST((doc_id * 3) % 256 AS VARCHAR)
             || '.' || CAST((doc_id * 5) % 256 AS VARCHAR)
        ELSE '' END
"""

_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_IPV4_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
_PHONE_RE = "\\+[0-9]{1,3} [0-9]{3}-[0-9]{4}"

PII_SQL = f"""
WITH aug AS (SELECT doc_id, {PII_AUG_SQL} AS text FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS INTEGER) AS n_email,
       CAST(len(regexp_extract_all(text, '{_IPV4_RE}')) AS INTEGER) AS n_ipv4,
       CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS INTEGER) AS n_phone,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
           '{_IPV4_RE}', '<IPV4>', 'g'),
         '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
FROM aug
ORDER BY doc_id
"""


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-level repetition / boilerplate signals per document
    (operators/text.py::repetition_stats)."""
    d = load(spark, sf_dir, "documents")
    return (
        T.repetition_stats(d, "text", "doc_id")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    )


# Mirrors repetition_stats: positions via unnest(range), bigrams via
# lead() over (doc, pos); ratio arithmetic in the identical IEEE order.
REPETITION_SQL = """
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
wp AS (
  SELECT doc_id, unnest(range(1, len(ws) + 1)) AS pos, unnest(ws) AS w
  FROM docs
),
per_word AS (
  SELECT doc_id, w, count(*) AS c FROM wp GROUP BY doc_id, w
),
per_doc AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
         CAST(count(*) AS BIGINT) AS n_distinct,
         max(c) AS top_c
  FROM per_word GROUP BY doc_id
),
bi AS (
  SELECT doc_id, CAST(count(DISTINCT bg) AS BIGINT) AS n_distinct_bigrams
  FROM (
    SELECT doc_id, w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS bg
    FROM wp
  )
  WHERE bg IS NOT NULL
  GROUP BY doc_id
)
SELECT p.doc_id, p.n_words, p.n_distinct,
       CAST(p.n_distinct AS DOUBLE) / CAST(p.n_words AS DOUBLE) AS distinct_ratio,
       CAST(p.top_c AS DOUBLE) / CAST(p.n_words AS DOUBLE) AS top_word_ratio,
       CASE WHEN p.n_words - 1 <= 0 THEN 0.0
            ELSE 1.0 - CAST(coalesce(b.n_distinct_bigrams, 0) AS DOUBLE)
                       / CAST(p.n_words - 1 AS DOUBLE) END AS dup_bigram_ratio
FROM per_doc p LEFT JOIN bi b ON p.doc_id = b.doc_id
ORDER BY p.doc_id
"""


def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 distinctive terms per language by tf * (N/df).

    The idf stays a rational N/df instead of ln(N/df): log is a libm
    call whose last ulp can differ between engines, while one division
    in a fixed order is bit-identical. Ranking (and hence the output)
    is unchanged — x -> ln(x) is monotone.

    Plan: explode words once; (lang, term) tf and term df are two
    partial-aggregated groupBys; df joins tf on term (uniform key);
    top-k per lang via rank window. All shuffles keyed by term/lang.
    """
    d = load(spark, sf_dir, "documents")
    words = d.select(
        "lang", "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    tf = words.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = words.select("doc_id", "term").distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    n_docs = d.select(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "lang",
            "term",
            "tf",
            "df",
            (
                F.col("tf").cast("double")
                * (F.col("n").cast("double") / F.col("df").cast("double"))
            ).alias("tfidf"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 10)
        .select("lang", "rank", "term", "tf", "df", "tfidf")
        .orderBy("lang", "rank")
    )


TFIDF_SQL = """
WITH words AS (
  SELECT lang, doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT lang, term, CAST(count(*) AS BIGINT) AS tf FROM words GROUP BY lang, term
),
docfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df
  FROM (SELECT DISTINCT doc_id, term FROM words) GROUP BY term
),
n_docs AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
scored AS (
  SELECT lang, term, tf, df,
         CAST(tf AS DOUBLE) * (CAST(n AS DOUBLE) / CAST(df AS DOUBLE)) AS tfidf
  FROM tf JOIN docfreq USING (term) CROSS JOIN n_docs
)
SELECT lang, CAST(rank AS INTEGER) AS rank, term, tf, df, tfidf
FROM (
  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY tfidf DESC, term) AS rank
  FROM scored
)
WHERE rank <= 10
ORDER BY lang, rank
"""


def text_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents whose length is >2 sample standard deviations from
    their language's mean — the classic distribution-based quality cut.

    Moments come from exact BIGINT sums (n, Σx, Σx²) so they are
    order-independent on any partitioning; mean/variance then derive in
    one fixed sequence of double ops the oracle mirrors exactly:
    var = (Σx² - Σx·mean)/(n-1), z = (x - mean)/sqrt(var).
    """
    d = load(spark, sf_dir, "documents")
    mom = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("s1"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("s2"),
    )
    stats = mom.select(
        "lang",
        (F.col("s1").cast("double") / F.col("n").cast("double")).alias("mean"),
        F.sqrt(
            (
                F.col("s2").cast("double")
                - F.col("s1").cast("double")
                * (F.col("s1").cast("double") / F.col("n").cast("double"))
            )
            / (F.col("n") - 1).cast("double")
        ).alias("sd"),
    )
    z = (F.col("n_chars").cast("double") - F.col("mean")) / F.col("sd")
    return (
        d.join(F.broadcast(stats), "lang")
        .select("doc_id", "lang", F.col("n_chars").cast("bigint").alias("n_chars"), z.alias("z"))
        .filter((F.col("z") > 2.0) | (F.col("z") < -2.0))
        .orderBy("doc_id")
    )


OUTLIER_SQL = """
WITH mom AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(n_chars) AS BIGINT) AS s1,
         CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
  FROM documents GROUP BY lang
),
stats AS (
  SELECT lang,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         sqrt((CAST(s2 AS DOUBLE)
               - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
              / CAST(n - 1 AS DOUBLE)) AS sd
  FROM mom
)
SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars,
       (CAST(d.n_chars AS DOUBLE) - s.mean) / s.sd AS z
FROM documents d JOIN stats s ON d.lang = s.lang
WHERE (CAST(d.n_chars AS DOUBLE) - s.mean) / s.sd > 2.0
   OR (CAST(d.n_chars AS DOUBLE) - s.mean) / s.sd < -2.0
ORDER BY d.doc_id
"""


def text_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram rarity — the deterministic analog of
    CCNet-style LM-perplexity quality filtering: documents whose tokens
    are rare across the corpus score high, boilerplate scores low.

    Perplexity proper is exp(-mean ln p(token)); ln is a libm call whose
    last ulp differs across engines and a per-doc double sum is
    partition-order-dependent, so neither survives a hash-exact oracle.
    Instead each token scores the scaled inverse document frequency
    (N_docs * 1e6) div df — pure BIGINT ops, bit-identical everywhere —
    and the per-doc aggregate is an exact DECIMAL(28,0) sum
    (order-independent on any partitioning). The final mean derives in
    one fixed sequence of double ops the oracle mirrors. Ranking is the
    same quality signal (monotone in mean inverse df).

    Plan: explode words once; df is one partial-aggregated groupBy on
    term; words join df on term (uniform key, broadcast-able when the
    vocabulary is small — AQE decides); per-doc aggregate shuffles on
    doc_id. At 100 TB every shuffle is keyed by term or doc_id — both
    high-cardinality and uniform.
    """
    d = load(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    docfreq = words.select("doc_id", "term").distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    n_docs = d.select(F.count(F.lit(1)).alias("n"))
    scored = (
        words.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select("doc_id", "lang", F.expr("n * 1000000 div df").alias("v"))
    )
    per_doc = scored.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("v").cast("decimal(28,0)")).alias("sv"),
    )
    return per_doc.select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        (
            F.col("sv").cast("double")
            / (F.lit(1000000.0) * F.col("n_tokens").cast("double"))
        ).alias("rarity"),
    ).orderBy("doc_id")


RARITY_SQL = """
WITH words AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term FROM documents
),
docfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df
  FROM (SELECT DISTINCT doc_id, term FROM words) GROUP BY term
),
n_docs AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
scored AS (
  SELECT doc_id, lang, (n * 1000000) // df AS v
  FROM words JOIN docfreq USING (term) CROSS JOIN n_docs
),
per_doc AS (
  SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_tokens,
         sum(CAST(v AS DECIMAL(28,0))) AS sv
  FROM scored GROUP BY doc_id, lang
)
SELECT doc_id, lang, n_tokens,
       CAST(sv AS DOUBLE) / (1000000.0 * CAST(n_tokens AS DOUBLE)) AS rarity
FROM per_doc ORDER BY doc_id
"""




def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking with overlap (operators/text.py
    chunk_with_overlap): 32-token chunks, 8-token overlap — the
    training-data chunking step. Pure map (split/sequence/slice inside
    whole-stage codegen), no shuffle."""
    from hudi_rs_spark.operators.text import chunk_with_overlap

    d = load(spark, sf_dir, "documents")
    return chunk_with_overlap(d, "text", "doc_id", 32, 8).orderBy(
        "id", "chunk_id"
    )


CHUNK_SQL = r"""
WITH w AS (
  SELECT doc_id AS id, regexp_extract_all(trim(text), '\S+') AS words
  FROM documents
), c AS (
  SELECT id, words,
         greatest(1, CAST(floor((len(words) - 8 + 23) / 24.0) AS INT)) AS nc
  FROM w
)
SELECT id,
       CAST(unnest(range(nc)) AS INTEGER) AS chunk_id,
       unnest(list_transform(range(nc),
              i -> array_to_string(list_slice(words, i*24+1, i*24+32), ' ')))
           AS chunk_text,
       CAST(unnest(list_transform(range(nc),
              i -> len(list_slice(words, i*24+1, i*24+32)))) AS INTEGER)
           AS n_tokens
FROM c
ORDER BY id, chunk_id
"""


def text_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality rules (operators/text.py gopher_rules): word
    bounds, mean word length, alphabetic fraction, stop-word presence —
    all integer arithmetic for cross-engine hash parity, one projection,
    no shuffle."""
    from hudi_rs_spark.operators.text import gopher_rules

    d = load(spark, sf_dir, "documents")
    return gopher_rules(d, "text", "doc_id").orderBy("id")


GOPHER_SQL = r"""
WITH w AS (
  SELECT doc_id AS id, regexp_extract_all(trim(text), '\S+') AS words
  FROM documents
), m AS (
  SELECT id,
         CAST(len(words) AS INTEGER) AS n_words,
         CAST(floor(list_sum(list_transform(words, x -> length(x)))
                    * 1000000.0 / len(words)) AS BIGINT) AS mean_wlen_micro,
         CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))
              AS INTEGER) AS alpha_words,
         CAST((CASE WHEN list_contains(words, 'the') THEN 1 ELSE 0 END)
            + (CASE WHEN list_contains(words, 'a')   THEN 1 ELSE 0 END)
            + (CASE WHEN list_contains(words, 'and') THEN 1 ELSE 0 END)
            + (CASE WHEN list_contains(words, 'of')  THEN 1 ELSE 0 END)
            + (CASE WHEN list_contains(words, 'to')  THEN 1 ELSE 0 END)
            + (CASE WHEN list_contains(words, 'in')  THEN 1 ELSE 0 END)
            + (CASE WHEN list_contains(words, 'is')  THEN 1 ELSE 0 END)
              AS INTEGER) AS stop_hits
  FROM w
)
SELECT id, n_words, mean_wlen_micro, alpha_words, stop_hits,
       (n_words BETWEEN 50 AND 100000
        AND mean_wlen_micro BETWEEN 3000000 AND 10000000
        AND alpha_words * 10 >= n_words * 8
        AND stop_hits >= 2) AS keep
FROM m
ORDER BY id
"""


for _n, _f, _s, _d in [
    ("text_token_stats", text_token_stats, TOKEN_SQL, "token + BPE-ish counting"),
    ("text_quality", text_quality, QUALITY_SQL, "quality scoring"),
    ("text_lang_id", text_lang_id, LANG_SQL, "stopword-voting language id"),
    ("text_fingerprint_groups", text_fingerprint_groups, FP_SQL, "doc fingerprinting"),
    ("text_pii_scrub", text_pii_scrub, PII_SQL, "PII detection + redaction"),
    ("text_repetition", text_repetition, REPETITION_SQL, "repetition/boilerplate signals"),
    ("text_tfidf_topterms", text_tfidf_topterms, TFIDF_SQL, "per-language TF-IDF top terms"),
    ("text_length_outliers", text_length_outliers, OUTLIER_SQL, "z-score length outliers"),
    ("text_rarity_score", text_rarity_score, RARITY_SQL,
     "unigram-rarity quality score (deterministic CCNet-perplexity analog)"),
    ("text_chunk_overlap", text_chunk_overlap, CHUNK_SQL,
     "token-window chunking with overlap (training-data chunker)"),
    ("text_gopher_filter", text_gopher_filter, GOPHER_SQL,
     "Gopher quality-rule filter (deterministic heuristic subset)"),
]:
    register(QuerySpec(name=_n, build=_f, oracle=_s, tags=("text",), doc=_d))
