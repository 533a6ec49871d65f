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
