"""Multimodal workload: REAL image decode through the driver gate.

The testdata has no binary column, so the query synthesizes one:
constant-color P6 PPM images generated deterministically from doc_id
(mapInPandas, Arrow-batched), then run through the real
operators/multimodal.py decode path (codecs.py PPM parser — actual
pixel bytes, actual channel means). The DuckDB oracle computes the
closed-form expectation of every feature (dimensions, byte size,
channel means of a constant image) — if the codec, the mapInPandas
plumbing, or the feature arithmetic drifts, the hash fails.

This upgrades multimodal from pytest-only to a full driver-gate row.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from hudi_rs_spark.operators import codecs
from hudi_rs_spark.operators.multimodal import image_features
from hudi_rs_spark.workloads import QuerySpec, register
from hudi_rs_spark.workloads.tables import load

GEN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("img", T.BinaryType(), False),
    ]
)


def synth_images(df: DataFrame) -> DataFrame:
    """Deterministic constant-color PPM per doc_id:
    width 4+id%5, height 3+id%4, rgb = (37id, 59id, 83id) mod 256."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = 4 + i % 5, 3 + i % 4
                rgb = [(i * 37) % 256, (i * 59) % 256, (i * 83) % 256]
                arr = np.full((h, w, 3), rgb, dtype=np.uint8)
                rows.append({"doc_id": i, "img": codecs.encode_ppm(arr)})
            yield pd.DataFrame(rows, columns=["doc_id", "img"])

    return df.select("doc_id").mapInPandas(gen, GEN_SCHEMA)


def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    feats = image_features(synth_images(d), "doc_id", "img")
    # content_hash is md5 over raw bytes — not closed-form in SQL; the
    # remaining features all are.
    return feats.drop("content_hash").orderBy("item_id")


# n_bytes = len("P6\n") + len(str(w)) + len(" ") + len(str(h)) + len("\n")
#         + len("255\n") + 3*w*h = 9 + |w| + |h| + 3wh (encode_ppm
# layout); means of a constant image are the
# constant / 255.0 — identical IEEE division in both engines.
MM_SQL = """
WITH dims AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
)
SELECT doc_id AS item_id,
       CAST(9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR))
            + 3 * w * h AS BIGINT) AS n_bytes,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST((doc_id * 37) % 256 AS DOUBLE) / 255.0 AS mean_r,
       CAST((doc_id * 59) % 256 AS DOUBLE) / 255.0 AS mean_g,
       CAST((doc_id * 83) % 256 AS DOUBLE) / 255.0 AS mean_b
FROM dims
ORDER BY item_id
"""

register(
    QuerySpec(
        name="mm_image_features",
        build=mm_image_features,
        oracle=MM_SQL,
        tags=("multimodal",),
        doc="real PPM decode vs closed-form oracle",
    )
)


AUDIO_GEN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("clip", T.BinaryType(), False),
    ]
)


def synth_clips(df: DataFrame) -> DataFrame:
    """Deterministic constant-amplitude PCM16 WAV per doc_id:
    rate 8/12/16 kHz, 1-2 channels, 100+id%50 frames, amp 91id%2000-1000."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                rate = 8000 + (i % 3) * 4000
                ch = 1 + i % 2
                nf = 100 + i % 50
                amp = (i * 91) % 2000 - 1000
                samples = np.full((nf, ch), amp, dtype="<i2")
                rows.append({"doc_id": i, "clip": codecs.encode_wav(rate, samples)})
            yield pd.DataFrame(rows, columns=["doc_id", "clip"])

    return df.select("doc_id").mapInPandas(gen, AUDIO_GEN_SCHEMA)


def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hudi_rs_spark.operators.multimodal import audio_features

    d = load(spark, sf_dir, "documents")
    return audio_features(synth_clips(d), "doc_id", "clip").orderBy("item_id")


# Closed forms: n_bytes = 44-byte canonical header + 2*frames*channels;
# RMS of a constant-amplitude signal is |amp| exactly (a^2 < 2^53 and
# IEEE sqrt of a perfect square is exact); duration = frames*1000//rate.
AUDIO_SQL = """
WITH p AS (
  SELECT doc_id,
         8000 + (doc_id % 3) * 4000 AS rate,
         1 + doc_id % 2 AS ch,
         100 + doc_id % 50 AS nf,
         (doc_id * 91) % 2000 - 1000 AS a
  FROM documents
)
SELECT doc_id AS item_id,
       CAST(44 + nf * ch * 2 AS BIGINT) AS n_bytes,
       CAST(rate AS INTEGER) AS sample_rate,
       CAST(ch AS INTEGER) AS n_channels,
       CAST(nf * 1000 // rate AS BIGINT) AS duration_ms,
       CAST(abs(a) AS DOUBLE) AS rms
FROM p
ORDER BY item_id
"""

register(
    QuerySpec(
        name="mm_audio_features",
        build=mm_audio_features,
        oracle=AUDIO_SQL,
        tags=("multimodal",),
        doc="real WAV decode vs closed-form oracle",
    )
)


def mm_resize_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through the REAL resize path: synth constant PPM ->
    nearest-neighbor resize to 16x16 -> re-decode features. Nearest
    resampling of a constant image is the same constant, so every
    output feature has a closed form (and n_bytes collapses to the
    fixed 16x16 PPM size)."""
    from hudi_rs_spark.operators.multimodal import image_features, resize_images

    d = load(spark, sf_dir, "documents")
    resized = resize_images(synth_images(d), "doc_id", "img", target=16)
    return image_features(resized, "item_id", "data").drop("content_hash").orderBy(
        "item_id"
    )


# 16x16 P6 PPM: "P6\n16 16\n255\n" (13 bytes) + 3*256 pixels = 781.
RESIZE_SQL = """
SELECT doc_id AS item_id,
       CAST(781 AS BIGINT) AS n_bytes,
       CAST(16 AS INTEGER) AS width,
       CAST(16 AS INTEGER) AS height,
       CAST((doc_id * 37) % 256 AS DOUBLE) / 255.0 AS mean_r,
       CAST((doc_id * 59) % 256 AS DOUBLE) / 255.0 AS mean_g,
       CAST((doc_id * 83) % 256 AS DOUBLE) / 255.0 AS mean_b
FROM documents
ORDER BY item_id
"""

register(
    QuerySpec(
        name="mm_resize_features",
        build=mm_resize_features,
        oracle=RESIZE_SQL,
        tags=("multimodal",),
        doc="real nearest-neighbor resize round-trip vs closed-form oracle",
    )
)


VIDEO_GEN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("vid", T.BinaryType(), False),
    ]
)

FRAME_MS = 500


def synth_videos(df: DataFrame) -> DataFrame:
    """Deterministic PPMV container per doc_id: 2+id%4 constant-color
    2x2 frames at 500ms each (frame f colored (37id+f)%256, ...)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                nf = 2 + i % 4
                frames = [
                    np.full(
                        (2, 2, 3),
                        [(i * 37 + f) % 256, (i * 59 + f) % 256, (i * 83 + f) % 256],
                        dtype=np.uint8,
                    )
                    for f in range(nf)
                ]
                rows.append({"doc_id": i, "vid": codecs.encode_ppmv(frames, FRAME_MS)})
            yield pd.DataFrame(rows, columns=["doc_id", "vid"])

    return df.select("doc_id").mapInPandas(gen, VIDEO_GEN_SCHEMA)


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PPMV demux through frame_sample (1 video row -> N frame
    rows): sampled-frame count and offsets depend on the decoded frame
    interval and count, both closed-form. frame_hash is md5 over raw
    pixel bytes — not SQL-expressible — so the query projects it away."""
    from hudi_rs_spark.operators.multimodal import frame_sample

    d = load(spark, sf_dir, "documents")
    out = frame_sample(synth_videos(d), "doc_id", "vid", every_ms=1000)
    return out.select("item_id", "frame_idx", "offset_ms").orderBy(
        "item_id", "frame_idx"
    )


# duration = 500ms * (2 + id%4); samples at 0,1000,2000,... ->
# ceil(duration/1000) rows = 1 + (id%4) // 2 + (id%4) % 2 ... simply
# (duration + 999) // 1000 computed directly below.
FRAME_SQL = """
WITH p AS (
  SELECT doc_id, (2 + doc_id % 4) * 500 AS duration FROM documents
),
idx AS (
  SELECT doc_id, unnest(range(0, (duration + 999) // 1000)) AS k FROM p
)
SELECT doc_id AS item_id,
       CAST(k AS INTEGER) AS frame_idx,
       CAST(k * 1000 AS BIGINT) AS offset_ms
FROM idx
ORDER BY item_id, frame_idx
"""

register(
    QuerySpec(
        name="mm_frame_sample",
        build=mm_frame_sample,
        oracle=FRAME_SQL,
        tags=("multimodal",),
        doc="real PPMV frame demux vs closed-form oracle",
    )
)
