"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — the query set is broadcast, the
corpus is scanned once, and top-k per query is a window over the
(bounded) candidate set. Scale path: LSH bucketing via signed random
hyperplanes so candidate generation becomes an equi-join on bucket
signatures; brute force then runs only within buckets.

All arithmetic folds element-wise with F.aggregate/F.zip_with in double
precision, sequential order — deterministic and oracle-matchable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hudi_rs_spark.operators.pin import pin


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Top-k cosine neighbors for each query vector.

    ``queries`` is broadcast (it is the small side by construction); the
    corpus streams through one stage. Returns
    (query_id, neighbor_id, rank) ranked by (cosine desc, neighbor_id).
    """
    # Precompute norms on each side so the per-pair work is one dot
    # product, not three array folds.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm(F.col(vec_col)).alias("qnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        norm(F.col(vec_col)).alias("cnorm"),
    )
    from pyspark.sql import Window

    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def int8_quantize(
    df: DataFrame, vec_col: str, id_col: str, out_id: str
) -> DataFrame:
    """Symmetric scalar int8 quantization of a float-vector column:
    per-vector scale = max|x|/127, q_i = floor(x_i/scale + 0.5)
    (round-half-up; values land in [-127, 127] by construction, no clip
    needed). Returns (out_id, qvec array<int>, qnorm bigint).

    The production rationale at 100 TB: an int8 corpus is 4x fewer scan
    + shuffle + broadcast bytes than float32 and the candidate scoring
    becomes an integer-SIMD dot product. The quantization runs in ONE
    Arrow-vectorized pandas UDF per side (a numpy matrix op per batch —
    per-vector work, map-only, no shuffle), shipping only the embedding
    column across the boundary and returning (qvec, qnorm) as a struct.

    Two measured dead ends, both r13 (guide §1.2 "measure first"):

    - The ORIGINAL shape evaluated the UDF and then filtered on a
      JVM-side fold of its output (``qnorm > 0`` in int8_brute_topk);
      Catalyst pushed that filter below the projection and DUPLICATED
      the UDF — two ArrowEvalPython nodes per side (guide §4.4).
      ``asNondeterministic()`` on the UDF is the spec-level defuse:
      Catalyst will not reorder a filter through a nondeterministic
      projection, so each side quantizes exactly once. The output is
      deterministic; the flag only pins evaluation order/count.
    - A pure-JVM rewrite (transform/array_max/aggregate higher-order
      functions, zero Python nodes) benched 97-210s vs 1.2-2.0s for
      this UDF on 100k x 384-dim vectors: separate selects did NOT
      stop the lambda inlining (the per-element plan re-derived the
      vector max -> O(dim^2) per vector), and interpreted per-element
      lambdas are >10x slower than numpy SIMD even at O(dim). Scan
      byte-savings cannot buy back an 80x compute regression, so the
      Arrow UDF is the 100 TB shape, per guide §4.1's own escape
      hatch: built-ins first UNLESS the built-in form degenerates.

    The dequantization scale is NOT kept: it cancels exactly in
    cosine, which is what downstream ranks by. All-zero vectors
    quantize to all-zero (scale pinned to 1) and carry qnorm 0 —
    consumers must exclude them from cosine ranking (0/0 is
    engine-dependent).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _quant(col):
        qvecs, qnorms = [], []
        for v in col:
            if v is None:
                qvecs.append(None)
                qnorms.append(None)
                continue
            x = np.asarray(v, dtype=np.float64)
            maxabs = float(np.max(np.abs(x))) if len(x) else 0.0
            scale = 1.0 if maxabs == 0.0 else maxabs / 127.0
            q = np.floor(x / scale + 0.5).astype(np.int32)
            qvecs.append(q)
            qnorms.append(int((q.astype(np.int64) ** 2).sum()))
        return pd.DataFrame(
            {
                "qvec": pd.Series(qvecs, dtype=object),
                "qnorm": pd.Series(qnorms, dtype=object),
            }
        )

    _quant.__annotations__ = {"col": pd.Series, "return": pd.DataFrame}
    quant = pandas_udf("struct<qvec: array<int>, qnorm: bigint>")(
        _quant
    ).asNondeterministic()
    s = quant(F.col(vec_col))
    return df.select(
        F.col(id_col).alias(out_id),
        s["qvec"].alias("qvec"),
        s["qnorm"].alias("qnorm"),
    )


def int8_brute_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Top-k by cosine over int8-QUANTIZED vectors — the quantized twin
    of ``brute_force_topk``. Scores are computed entirely from integer
    dot products (the per-vector dequantization scales cancel in
    cosine): cos_q = int_dot / sqrt(qnorm_q * qnorm_c), one integer
    fold per pair plus one sqrt + one division — both IEEE
    correctly-rounded, so the ranking is bit-reproducible across
    engines. Zero-norm vectors are excluded on both sides. Returns
    (query_id, neighbor_id, rank) ranked by (quantized cosine desc,
    neighbor_id).
    """
    from pyspark.sql import Window

    q = int8_quantize(queries, vec_col, id_col, "query_id").filter(
        F.col("qnorm") > 0
    ).withColumnsRenamed({"qvec": "qv", "qnorm": "qn"})
    c = int8_quantize(corpus, vec_col, id_col, "neighbor_id").filter(
        F.col("qnorm") > 0
    )
    int_dot = F.aggregate(
        F.zip_with("qv", "qvec", lambda a, b: a.cast("bigint") * b.cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                int_dot.cast("double")
                / F.sqrt((F.col("qn") * F.col("qnorm")).cast("double"))
            ).alias("qcos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("qcos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _plane(seed: str, dim: int, j: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from md5 — reproducible
    across engines and runs without Math.random."""
    import hashlib

    vals = []
    for d in range(dim):
        h = hashlib.md5(f"{seed}:{j}:{d}".encode()).hexdigest()
        # map 8 hex chars -> [-1, 1)
        vals.append(int(h[:8], 16) / float(0x80000000) - 1.0)
    return vals


def lsh_bucket_signature(
    vec: Column,
    dim: int,
    n_planes: int = 8,
    seed: str = "hudi-rs-spark",
    plane_offset: int = 0,
) -> Column:
    """Sign-of-projection signature: n_planes bits packed into an int.
    Vectors in the same bucket are likely neighbors (random hyperplane
    LSH for cosine similarity). ``plane_offset`` selects which planes of
    the global md5-derived sequence this signature uses — banded LSH
    gives each band its own disjoint plane range."""
    sig = F.lit(0)
    for j in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _plane(seed, dim, plane_offset + j)])
        proj = dot(vec, plane)
        sig = sig + F.when(proj >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_planes: int = 8,
) -> DataFrame:
    """ANN top-k: candidates = same LSH bucket; exact cosine re-rank within.

    At 100 TB the bucket signature is the shuffle key; each bucket's
    candidate set is small, so the per-query work no longer scans the
    corpus. Recall < 1.0 by construction (probe multiplicity can be added
    by hashing with several plane sets).
    """
    from pyspark.sql import Window

    csig = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        norm(F.col(vec_col)).alias("cnorm"),
        lsh_bucket_signature(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    qsig = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm(F.col(vec_col)).alias("qnorm"),
        lsh_bucket_signature(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    scored = (
        csig.join(F.broadcast(qsig), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
) -> DataFrame:
    """IVF (inverted-file) ANN top-k: the scale path beyond one LSH table.

    1. centroids: the ``n_centroids`` corpus vectors with the smallest
       md5(id) — deterministic, engine-portable "random" sample (a k-means
       refinement would drop in here; seed selection keeps the oracle
       exact)
    2. build: every corpus vector joins its nearest centroid (argmax
       cosine; ties -> lowest centroid id) => the inverted lists
    3. probe: each query searches its ``nprobe`` nearest cells only
    4. exact cosine re-rank inside the probed cells

    The candidate join is an equi-join on cell id; at scale the corpus
    assignment is the partitioning, so a query touches nprobe/n_centroids
    of the data. Recall < 1.0 by construction (raise nprobe to trade).
    Returns (query_id, neighbor_id, rank).
    """
    from pyspark.sql import Window

    from hudi_rs_spark.operators.pin import pin

    cents = (
        corpus.select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).alias("cent"),
            norm(F.col(vec_col)).alias("cent_norm"),
            F.md5(F.col(id_col).cast("string")).alias("__h"),
        )
        .orderBy("__h", "cid")
        .limit(n_centroids)
        .drop("__h")
    )
    # pin: this n_centroids-row frame is broadcast into BOTH assign()
    # calls below; unpinned, each broadcast re-executes the full-corpus
    # scan + global top-n_centroids sort that selects the seeds — two
    # extra corpus passes for an 8-row result (guide §2.4/§5: reuse
    # beats recompute when the recompute is a full pass)
    cents = pin(cents)

    def assign(side: DataFrame, sid: str, svec: str, snorm: str, keep: int) -> DataFrame:
        scored = side.crossJoin(F.broadcast(cents)).select(
            sid,
            svec,
            snorm,
            "cid",
            (dot(F.col(svec), F.col("cent")) / (F.col(snorm) * F.col("cent_norm"))).alias(
                "ccos"
            ),
        )
        w = Window.partitionBy(sid).orderBy(F.desc("ccos"), F.asc("cid"))
        return (
            scored.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= keep)
            .drop("ccos", "__r")
        )

    c = assign(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cvec"),
            norm(F.col(vec_col)).alias("cnorm"),
        ),
        "neighbor_id", "cvec", "cnorm", 1,
    )
    q = assign(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            norm(F.col(vec_col)).alias("qnorm"),
        ),
        "query_id", "qvec", "qnorm", nprobe,
    )
    scored = (
        c.join(F.broadcast(q), "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm"))).alias("cos"),
        )
        .distinct()  # a neighbor reachable via several probed cells counts once
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _band_signature_udf(dim: int, n_bands: int, planes_per_band: int, seed: str):
    """Arrow-batched band signatures: ONE (batch x dim) @ (dim x planes)
    matmul yields every plane projection, then sign bits pack into one
    long per band. Returns a pandas UDF producing array<long> of length
    ``n_bands`` (band index = array position). Plane numbering matches
    ``lsh_bucket_signature(plane_offset=band*planes_per_band)`` exactly,
    so the two implementations are interchangeable."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    planes = np.array(
        [
            _plane(seed, dim, b * planes_per_band + j)
            for b in range(n_bands)
            for j in range(planes_per_band)
        ],
        dtype=np.float64,
    )
    mat = planes.T.copy()  # dim x (n_bands * planes_per_band)
    weights = (np.int64(1) << np.arange(planes_per_band, dtype=np.int64))

    def band_sigs(col):
        if not len(col):
            return pd.Series([], dtype=object)
        # null / wrong-dimension vectors can't be hashed: emit a null
        # signature array (posexplode then yields no candidate rows for
        # them, so they simply never pair — the pre-r7 expression path
        # dropped them at the exact-cosine filter the same way)
        vals = list(col)
        valid = [
            i for i, v in enumerate(vals) if v is not None and len(v) == dim
        ]
        out = [None] * len(vals)
        if valid:
            x = np.asarray(
                [np.asarray(vals[i], dtype=np.float64) for i in valid],
                dtype=np.float64,
            )
            bits = (x @ mat) >= 0
            sigs = bits.reshape(len(valid), n_bands, planes_per_band) @ weights
            for j, i in enumerate(valid):
                out[i] = sigs[j]
        return pd.Series(out, dtype=object)

    # real annotation objects (module uses `from __future__ import
    # annotations`, and string hints can't resolve a local `pd`)
    band_sigs.__annotations__ = {"col": pd.Series, "return": pd.Series}
    return pandas_udf("array<long>")(band_sigs)


def embedding_near_dups(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    dim: int = 64,
    n_bands: int = 4,
    planes_per_band: int = 8,
    seed: str = "hudi-rs-spark",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — BANDED (multi-table)
    hyperplane LSH candidate generation, then exact cosine on the
    deduplicated candidate set.

    Band ``b`` hashes the disjoint plane range
    ``[b*planes_per_band, (b+1)*planes_per_band)``; a pair is a
    candidate iff it collides in AT LEAST ONE band (OR over bands — the
    MinHash banding construction applied to sign-random-projection LSH,
    same shape as ``operators/dedup.py::minhash_lsh_pairs``). Per-band
    bucket population is ~n/2**planes_per_band, so raising
    ``planes_per_band`` with corpus size keeps within-bucket candidate
    sets bounded (a single fixed-width signature has a CONSTANT bucket
    count and degenerates to O(n^2) within-bucket pairs at scale), while
    adding bands buys the lost recall back.

    The candidate join carries IDS ONLY (the exploded (band, sig) keys),
    so the shuffle is 3 longs per (row, band); vectors re-join by id for
    the exact check afterwards — never replicated per band. All
    ``n_bands * planes_per_band`` plane projections are computed in ONE
    Arrow-batched numpy matmul per input batch (a per-plane
    higher-order-function dot is interpreted per element and dominates
    runtime past ~8 planes — dense linear algebra is the case where a
    vectorized pandas UDF beats the built-ins). Returns (id_a, id_b)
    with cosine >= threshold, id_a < id_b.
    """
    sig_udf = _band_signature_udf(dim, n_bands, planes_per_band, seed)
    keys = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(sig_udf(F.col(vec_col))).alias("band", "sig"),
    )
    # Materialize the (id, band, sig) index before the self-join — the
    # exchange is not reused across join sides, so the signature UDF
    # (the expensive matmul pass over every vector) would otherwise run
    # twice. The index is 3 small columns per (row, band).
    keys = pin(keys)
    cand = (
        keys.select(F.col("id").alias("id_a"), "band", "sig")
        .join(keys.select(F.col("id").alias("id_b"), "band", "sig"), ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    vecs = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("vn"),
    )
    return (
        cand.join(
            vecs.select(
                F.col("vid").alias("id_a"), F.col("v").alias("va"), F.col("vn").alias("na")
            ),
            "id_a",
        )
        .join(
            vecs.select(
                F.col("vid").alias("id_b"), F.col("v").alias("vb"), F.col("vn").alias("nb")
            ),
            "id_b",
        )
        .filter(
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))) >= threshold
        )
        .select("id_a", "id_b")
    )
