"""MOR read-path workloads over a REAL Hudi table.

Every other benched query reads plain parquet; these two exercise the
engine's hardest path — Hudi log-block decode + per-file-group merge
through the Python Data Source connector — as oracle-checked, benchable
registry entries (VERDICT r6 next-round #7: "every headline bench query
runs on plain parquet; the log-decode + merge path is never benched").

The MOR table is synthesized deterministically FROM the driver's
``documents`` parquet with the package's experimental writer
(``hudi_rs_spark.write``), so the DuckDB oracle can state the expected
merged result in pure SQL over ``documents``:

- C1: 8 file groups (``doc_id % 8``), base files carry every document
- C2: log blocks upsert docs with ``doc_id % 10 == 0`` -> upper(text)
- C3: log blocks upsert docs with ``doc_id % 7 == 0`` -> text || '#r3'
  (docs divisible by 70 get both updates; C3 wins on the ordering field)
- C4: DELETE blocks remove docs with ``doc_id % 13 == 0`` (ordering 4
  beats every prior version — exercises the delete-aware merge)

The synthesized table is cached under ``.cache/mor_bench/`` keyed by the
source fingerprint, so bench best-of-N and repeated driver runs reuse
one table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from hudi_rs_spark.workloads import QuerySpec, register

C1 = "20240101000000000"
C2 = "20240102000000000"
C3 = "20240103000000000"
C4 = "20240104000000000"
N_GROUPS = 8
_LAYOUT_V = "v2"  # bump when the synthesized layout changes (cache key)

_REPO_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".cache", "mor_bench")


def _ensure_mor_table(sf_dir: str) -> str:
    """Build (once) the MOR table derived from ``documents``; returns the
    table base path. Build is atomic: write into a scratch dir, rename
    into place, so concurrent callers never see a half-written table."""
    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, "documents.parquet")
    n_rows = pq.read_metadata(src).num_rows
    # fingerprint includes the source size: a regenerated documents.parquet
    # with the same row count but different content must not hit a stale
    # cached table (its oracle would mismatch)
    name = (
        f"docs_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{n_rows}_{os.path.getsize(src)}_{_LAYOUT_V}"
    )
    base = os.path.join(_REPO_CACHE, name)
    if os.path.isdir(os.path.join(base, ".hoodie")):
        return base

    from hudi_rs_spark.write import (
        HudiTableWriter,
        avro_schema,
        delete_block,
        parquet_data_block,
    )

    tbl = pq.read_table(src, columns=["doc_id", "text"])
    doc_ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()

    os.makedirs(_REPO_CACHE, exist_ok=True)
    scratch = base + ".tmp"
    if os.path.isdir(scratch):  # stale crashed build
        import shutil

        shutil.rmtree(scratch)
    w = HudiTableWriter(scratch, record_key="doc_id", ordering="ts")
    schema = avro_schema(
        [("doc_id", "long"), ("ts", "long"), ("text", "string")]
    )
    by_group: dict[int, list[int]] = {g: [] for g in range(N_GROUPS)}
    for i, d in enumerate(doc_ids):
        by_group[d % N_GROUPS].append(i)
    for g, idxs in by_group.items():
        w.write_base(
            f"g{g}-0", C1,
            {
                "doc_id": [doc_ids[i] for i in idxs],
                "ts": [1] * len(idxs),
                "text": [texts[i] for i in idxs],
            },
            [str(doc_ids[i]) for i in idxs],
        )
    w.commit(C1, schema=schema)

    def _upsert(instant: str, pred, transform) -> None:
        for g, idxs in by_group.items():
            hit = [i for i in idxs if pred(doc_ids[i])]
            if not hit:
                continue
            rows = w.log_rows(
                instant,
                {
                    "doc_id": [doc_ids[i] for i in hit],
                    "ts": [int(instant[7])] * len(hit),  # 1<2<3 by day
                    "text": [transform(texts[i]) for i in hit],
                },
                [str(doc_ids[i]) for i in hit],
                "log",
            )
            w.append_log(
                f"g{g}-0", C1, parquet_data_block(instant, rows),
                version=int(instant[7]), stats_instant=instant,
            )

    _upsert(C2, lambda d: d % 10 == 0, str.upper)
    _upsert(C3, lambda d: d % 7 == 0, lambda t: t + "#r3")
    for g, idxs in by_group.items():
        hit = [doc_ids[i] for i in idxs if doc_ids[i] % 13 == 0]
        if hit:
            w.append_log(
                f"g{g}-0", C1,
                delete_block(C4, [(str(d), "", 4) for d in hit]),
                version=4, stats_instant=C4,
            )
    w.commit(C2, schema=schema)
    w.commit(C3, schema=schema)
    w.commit(C4, schema=schema)
    try:
        os.rename(scratch, base)
    except OSError:
        # only a concurrent builder winning the rename is benign (both
        # builds are byte-identical) — anything else (EXDEV, EACCES)
        # must surface, not turn into a later FileNotFoundError
        if not os.path.isdir(os.path.join(base, ".hoodie")):
            raise
        import shutil

        shutil.rmtree(scratch, ignore_errors=True)
    return base


_REGISTERED_SESSIONS: set[int] = set()


def _connector_df(spark: SparkSession, sf_dir: str, **options) -> DataFrame:
    from hudi_rs_spark.sources.pyds import HudiPyDataSource

    if id(spark) not in _REGISTERED_SESSIONS:  # once per session: avoids
        # a "replaced a previously registered data source" warning per call
        spark.dataSource.register(HudiPyDataSource)
        _REGISTERED_SESSIONS.add(id(spark))
    reader = spark.read.format("hudi_py").option("path", _ensure_mor_table(sf_dir))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def mor_snapshot_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full snapshot through the connector: executors decode each file
    group's log blocks and merge against the base on (group, key, ts)."""
    df = _connector_df(spark, sf_dir)
    return df.select("doc_id", "text").orderBy("doc_id")


MOR_SNAPSHOT_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 7 = 0 THEN text || '#r3'
            WHEN doc_id % 10 = 0 THEN upper(text)
            ELSE text END AS text
FROM documents
WHERE doc_id % 13 <> 0
ORDER BY doc_id
"""


def mor_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental window (C1, latest]: the merged LATEST version of
    every key touched after the first commit — the CDC-less refresh a
    downstream pipeline would poll."""
    df = _connector_df(
        spark, sf_dir, queryType="incremental", startTimestamp=C1
    )
    return df.select("doc_id", "text").orderBy("doc_id")


MOR_INCREMENTAL_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 7 = 0 THEN text || '#r3'
            ELSE upper(text) END AS text
FROM documents
WHERE (doc_id % 7 = 0 OR doc_id % 10 = 0) AND doc_id % 13 <> 0
ORDER BY doc_id
"""


for _n, _f, _s, _d in [
    ("mor_snapshot_merge", mor_snapshot_merge, MOR_SNAPSHOT_SQL,
     "Hudi MOR snapshot: connector log-decode + merge"),
    ("mor_incremental_refresh", mor_incremental_refresh, MOR_INCREMENTAL_SQL,
     "Hudi MOR incremental window through the connector"),
]:
    register(QuerySpec(name=_n, build=_f, oracle=_s, tags=("mor", "hudi"), doc=_d))
