"""Dedup workload over the documents table, oracle-checked.

Each query runs the operators in hudi_rs_spark/operators/dedup.py; the
DuckDB oracle re-expresses the same deterministic algorithm (md5-based
hashing keeps both engines bit-identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hudi_rs_spark.operators import dedup as D
from hudi_rs_spark.workloads import QuerySpec, register
from hudi_rs_spark.workloads.tables import load

# DuckDB expression for the shared normalized() text form.
SQL_NORM = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"
)
# Distinct 3-gram shingles of the normalized form (1-based substring).
SQL_SHINGLES = (
    "list_distinct(list_transform(range(1, greatest(length({norm}) - 2, 1) + 1),"
    " i -> substring({norm}, i, 3)))"
).format(norm="norm")


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return D.exact_dedup(d, "text", "doc_id").orderBy("fingerprint")


EXACT_SQL = """
SELECT md5(text) AS fingerprint, min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS dup_count
FROM documents
GROUP BY md5(text)
ORDER BY fingerprint
"""


def dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint dedup on the canonical (case/punct-insensitive) form."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.md5(D.normalized(F.col("text"))).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
        .orderBy("fingerprint")
    )


NORM_SQL = f"""
SELECT md5({SQL_NORM}) AS fingerprint, min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS dup_count
FROM documents
GROUP BY 1
ORDER BY fingerprint
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram Jaccard near-dup pairs, blocked on (lang, length bucket):
    the candidate join is an equi-join and near-dups necessarily land in
    the same or adjacent length bucket (the bucket width is the contract),
    keeping pair count ~linear in corpus size."""
    d = load(spark, sf_dir, "documents").withColumn(
        "len_bucket", F.floor(F.col("n_chars") / 50).cast("bigint")
    )
    return D.ngram_jaccard_pairs(
        d, "text", "doc_id", k=3, threshold=0.6, block_cols=("lang", "len_bucket")
    ).orderBy("id_a", "id_b")


JACCARD_SQL = f"""
WITH sh AS (
  SELECT doc_id, lang, CAST(floor(n_chars / 50) AS BIGINT) AS len_bucket,
         {SQL_SHINGLES} AS shingles
  FROM (SELECT doc_id, lang, n_chars, {SQL_NORM} AS norm FROM documents)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       floor(CAST(length(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             / CAST(length(a.shingles) + length(b.shingles)
                    - length(list_intersect(a.shingles, b.shingles)) AS DOUBLE) * 1000000.0) / 1000000.0 AS jaccard
FROM sh a JOIN sh b ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
WHERE CAST(length(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
      / CAST(length(a.shingles) + length(b.shingles)
             - length(list_intersect(a.shingles, b.shingles)) AS DOUBLE) >= 0.6
ORDER BY id_a, id_b
"""


def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate pairs (Lee et al. 2021 containment
    dedup): any two documents sharing a verbatim 8-word normalized run,
    stride-1 windows so arbitrary offsets align; boilerplate windows
    (>64 docs) excluded — the same rule in both engines."""
    d = load(spark, sf_dir, "documents")
    return D.substring_dup_pairs(
        d, "text", "doc_id", window=8, max_bucket_docs=64
    ).orderBy("id_a", "id_b")


SUBSTRING_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split({SQL_NORM}, ' ') AS words FROM documents
), sh AS (
  SELECT doc_id, md5(array_to_string(words[i:i+7], ' ')) AS h,
         CAST(min(i) AS INT) AS pos
  FROM w, unnest(range(1, greatest(length(words) - 7, 0) + 1)) AS t(i)
  GROUP BY doc_id, h
), ok AS (
  SELECT h FROM sh GROUP BY h HAVING count(*) BETWEEN 2 AND 64
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(count(*) AS BIGINT) AS shared_windows,
       min(a.pos) AS pos_a, min(b.pos) AS pos_b
FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
WHERE a.h IN (SELECT h FROM ok)
GROUP BY 1, 2
ORDER BY id_a, id_b
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH(4 bands) candidate pairs over word bigrams."""
    d = load(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(d, "text", "doc_id", k=2, num_hashes=16, bands=4).orderBy(
        "id_a", "id_b"
    )


# word-bigram shingles of the normalized form (duckdb mirror of
# operators/dedup.py word_shingles; string_split matches Spark split(' '))
SQL_WORD_SHINGLES = (
    "list_distinct(list_transform("
    "range(1, greatest(length(string_split(norm, ' ')) - 1, 1) + 1),"
    " i -> concat_ws(' ', string_split(norm, ' ')[i], string_split(norm, ' ')[i+1])))"
)

# One md5 per shingle; 16 permutations derived arithmetically from the
# digest halves (mirrors operators/dedup.py minhash_lsh_pairs exactly —
# all operands < 2^38 so BIGINT math is identical in both engines).
# The WITH body is shared: MINHASH_SQL selects the pairs, CLUSTER_SQL
# extends it with a recursive transitive closure, and
# workloads/pipeline.py rebinds the source relation via minhash_cte().


def minhash_cte(source: str = "documents") -> str:
    """The minhash-LSH candidate-pair CTE chain over any relation with
    (doc_id, text) — `cand` is the resulting pair set."""
    return MINHASH_CTE.replace("FROM documents", f"FROM {source}")


MINHASH_CTE = f"""
WITH docs AS (SELECT doc_id, {SQL_NORM} AS norm FROM documents),
sh AS (
  SELECT doc_id, unnest({SQL_WORD_SHINGLES}) AS s
  FROM docs
),
halves AS (
  SELECT doc_id,
         ('0x' || substr(md5(s), 1, 8))::BIGINT AS hi,
         ('0x' || substr(md5(s), 9, 8))::BIGINT AS lo
  FROM sh
),
seeds AS (SELECT unnest(range(0, 16)) AS seed),
mh AS (
  SELECT doc_id, seed,
         min((hi * (2 * seed + 1) + lo * (seed + 7)) % 4294967291) AS m
  FROM halves CROSS JOIN seeds
  GROUP BY doc_id, seed
),
bands AS (
  SELECT doc_id, seed // 4 AS band,
         md5(CAST(seed // 4 AS VARCHAR) || '|' || string_agg(CAST(m AS VARCHAR), '|' ORDER BY seed)) AS bucket
  FROM mh
  GROUP BY doc_id, seed // 4
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
)"""

MINHASH_SQL = MINHASH_CTE + "\nSELECT id_a, id_b FROM cand ORDER BY id_a, id_b\n"


def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH pairs contracted into duplicate clusters; every doc is
    assigned its canonical (min-id) survivor plus the cluster size.

    The contraction is distributed min-label propagation
    (operators/graph.py::connected_components); the oracle is the exact
    same closure via DuckDB's recursive CTE — both sides compute the
    min reachable id, which is iteration-order independent."""
    from hudi_rs_spark.operators.graph import connected_components

    d = load(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(d, "text", "doc_id")
    comp = connected_components(pairs, assume_distinct=True)
    labeled = d.select("doc_id").join(
        comp.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    )
    canon = labeled.select(
        "doc_id", F.coalesce("component", F.col("doc_id")).alias("canon_id")
    )
    # cluster_size as a window count over canon_id (r14, guide §2.4):
    # the old groupBy(canon_id) + join-back shuffled the corpus TWICE on
    # canon_id (aggregate exchange + join exchange on each side); the
    # window is one exchange and is literally the oracle's own shape
    # (count(*) OVER (PARTITION BY canon_id)).
    w = Window.partitionBy("canon_id")
    return canon.select(
        "doc_id", "canon_id", F.count(F.lit(1)).over(w).alias("cluster_size")
    ).orderBy("doc_id")


# DuckDB recursive CTE: walk = reachability over the symmetrized edge
# set; min reachable id (incl. self) == the propagation fixpoint.
# (RECURSIVE applies to the whole WITH list and is a no-op for the
# non-recursive members, so MINHASH_SQL itself stays plain.)
CLUSTER_SQL = MINHASH_CTE.replace("WITH docs", "WITH RECURSIVE docs", 1) + """,
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
SELECT doc_id, canon_id, CAST(count(*) OVER (PARTITION BY canon_id) AS BIGINT) AS cluster_size
FROM canon
ORDER BY doc_id
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with the md5-derived 64-bit token hash
    (oracle-checkable in DuckDB; xxhash64 is the documented production
    variant — same pipeline, one flag). At max_hamming=3 the 16-bit-chunk
    pigeonhole blocking is lossless, so the oracle's full O(n^2) hamming
    join computes the identical pair set."""
    d = load(spark, sf_dir, "documents")
    return D.simhash_pairs(
        d, "text", "doc_id", max_hamming=3, token_hash="md5"
    ).orderBy("id_a", "id_b")


# Oracle mirror of operators/dedup.py simhash with token_hash="md5":
# 64-bit token hash = (hi32 << 32) | lo32 from md5 hex; kept as two 32-bit
# halves so no DuckDB shift ever overflows signed BIGINT. Bit b of the
# simhash is the sign of the per-bit token vote; hamming distance is
# popcount over both halves. No blocking needed: at hamming<=3 the Spark
# side's pigeonhole blocking is exact (see simhash_pairs docstring).
SIMHASH_SQL = f"""
WITH docs AS (SELECT doc_id, {SQL_NORM} AS norm FROM documents),
toks AS (SELECT doc_id, unnest(list_distinct(string_split(norm, ' '))) AS t FROM docs),
th AS (
  SELECT doc_id,
         ('0x' || substr(md5(t), 1, 8))::BIGINT AS hi,
         ('0x' || substr(md5(t), 9, 8))::BIGINT AS lo
  FROM toks
),
votes AS (
  SELECT doc_id, b,
         sum(CASE WHEN ((CASE WHEN b < 32 THEN lo ELSE hi END) >> (b % 32)) & 1 = 1
                  THEN 1 ELSE -1 END) AS v
  FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS b) bits
  GROUP BY doc_id, b
),
sims AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN b < 32 AND v > 0 THEN 1::BIGINT << b ELSE 0 END) AS BIGINT) AS simlo,
         CAST(sum(CASE WHEN b >= 32 AND v > 0 THEN 1::BIGINT << (b - 32) ELSE 0 END) AS BIGINT) AS simhi
  FROM votes GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simlo, b.simlo)) + bit_count(xor(a.simhi, b.simhi)) AS INTEGER) AS hamming
FROM sims a JOIN sims b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simlo, b.simlo)) + bit_count(xor(a.simhi, b.simhi)) <= 3
ORDER BY id_a, id_b
"""


for _n, _f, _s, _d in [
    ("dedup_exact", dedup_exact, EXACT_SQL, "exact hash dedup"),
    ("dedup_normalized", dedup_normalized, NORM_SQL, "canonical-form dedup"),
    ("dedup_ngram_jaccard", dedup_ngram_jaccard, JACCARD_SQL, "ngram jaccard near-dup"),
    ("dedup_exact_substring", dedup_exact_substring, SUBSTRING_SQL,
     "exact-substring containment dedup (shared verbatim word runs)"),
    ("dedup_minhash_lsh", dedup_minhash_lsh, MINHASH_SQL, "minhash+LSH banding"),
    (
        "dedup_cluster_canonical",
        dedup_cluster_canonical,
        CLUSTER_SQL,
        "near-dup clusters via connected components",
    ),
    ("dedup_simhash", dedup_simhash, SIMHASH_SQL, "simhash hamming near-dup"),
]:
    register(QuerySpec(name=_n, build=_f, oracle=_s, tags=("dedup",), doc=_d))


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (batch-over-history) dedup: the standing pipeline
    shape where each NEW ingestion batch is deduped against the
    fingerprints of everything already accepted — an anti-join against
    the seen-set, never a recompute over history. The history/new split
    is carved deterministically (doc_id % 10) so both engines agree.

    At 100 TB the seen-set is a compact (fingerprint) table: the
    anti-join shuffles only fingerprints (16-byte keys, uniform), and
    AQE broadcasts it whenever the batch's fingerprint set is small.
    """
    from hudi_rs_spark.operators.text import fingerprint

    d = load(spark, sf_dir, "documents")
    history = d.filter(F.col("doc_id") % 10 < 8)
    new = d.filter(F.col("doc_id") % 10 >= 8)
    seen = history.select(fingerprint(F.col("text")).alias("fp")).distinct()
    return (
        new.select("doc_id", fingerprint(F.col("text")).alias("fp"))
        .join(seen, "fp", "left_anti")
        .select("doc_id", "fp")
        .orderBy("doc_id")
    )


INCREMENTAL_DEDUP_SQL = f"""
WITH fps AS (
  SELECT doc_id, md5({SQL_NORM}) AS fp FROM documents
),
seen AS (
  SELECT DISTINCT fp FROM fps WHERE doc_id % 10 < 8
)
SELECT f.doc_id, f.fp
FROM fps f
WHERE f.doc_id % 10 >= 8
  AND NOT EXISTS (SELECT 1 FROM seen s WHERE s.fp = f.fp)
ORDER BY f.doc_id
"""

register(
    QuerySpec(
        name="dedup_incremental",
        build=dedup_incremental,
        oracle=INCREMENTAL_DEDUP_SQL,
        tags=("dedup",),
        doc="new-batch vs seen-set fingerprint anti-join",
    )
)
