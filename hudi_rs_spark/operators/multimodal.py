"""Multimodal column operators: image/audio/video as opaque BINARY
columns with typed metadata.

Design for 100 TB: media bytes ride in parquet BINARY columns (or
pointers to object storage); all per-item compute is Arrow-batched
Python (``mapInPandas``) so bytes cross the JVM/Python boundary once per
batch, never per row. Partitioning is inherited from the scan — media
work is embarrassingly parallel, so there is NO shuffle in any operator
here.

The actual codec step is environment-dependent (this container has no
image/audio libraries), so decoding is pluggable: ``set_decoder`` installs
a real decoder (e.g. PIL) when available; the default is a clearly-marked
DETERMINISTIC STUB that derives pseudo pixel statistics from the bytes —
the Spark-side plumbing (schemas, batching, UDF signatures) is real and
tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def _stub_decode(data: bytes) -> dict:
    """Deterministic fake decode: pseudo dimensions + channel means from
    the content hash. Replace via set_decoder() where PIL/ffmpeg exist."""
    if data is None:
        return {"width": None, "height": None, "mean_r": None, "mean_g": None, "mean_b": None}
    h = hashlib.md5(data).digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "mean_r": h[2] / 255.0,
        "mean_g": h[3] / 255.0,
        "mean_b": h[4] / 255.0,
    }


_DECODER: Callable[[bytes], dict] = _stub_decode


def set_decoder(fn: Callable[[bytes], dict]) -> None:
    global _DECODER
    _DECODER = fn


try:  # pragma: no cover - PIL is absent in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_hash", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
    ]
)


def image_features(df: DataFrame, id_col: str, data_col: str) -> DataFrame:
    """Per-image features via mapInPandas (one Python call per Arrow
    batch; decode is the pluggable step)."""
    id_name, data_name = id_col, data_col

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for item_id, data in zip(pdf[id_name], pdf[data_name]):
                data = bytes(data) if data is not None else None
                dec = _DECODER(data)
                out.append(
                    {
                        "item_id": int(item_id),
                        "n_bytes": len(data) if data is not None else 0,
                        "content_hash": hashlib.md5(data).hexdigest() if data else None,
                        **dec,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return df.select(id_col, data_col).mapInPandas(compute, IMAGE_FEATURES_SCHEMA)


def resize_images(df: DataFrame, id_col: str, data_col: str, target: int = 224) -> DataFrame:
    """Resize plumbing: binary-in/binary-out mapInPandas. Without a codec
    the stub passes bytes through and records the intended target size."""
    schema = T.StructType(
        [
            T.StructField("item_id", T.LongType(), True),
            T.StructField("data", T.BinaryType(), True),
            T.StructField("target_size", T.IntegerType(), True),
        ]
    )
    id_name, data_name = id_col, data_col

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if _HAVE_PIL:  # pragma: no cover
                raise NotImplementedError("real resize path requires PIL wiring")
            yield pd.DataFrame(
                {
                    "item_id": pdf[id_name].astype("int64"),
                    "data": pdf[data_name],
                    "target_size": target,
                }
            )

    return df.select(id_col, data_col).mapInPandas(compute, schema)


def frame_sample(
    df: DataFrame, id_col: str, data_col: str, every_ms: int = 1000
) -> DataFrame:
    """Video frame sampling plumbing: one row in -> N frame rows out
    (mapInPandas naturally expresses 1->N). Stub emits deterministic
    frame offsets from the content hash in place of real demuxing."""
    schema = T.StructType(
        [
            T.StructField("item_id", T.LongType(), True),
            T.StructField("frame_idx", T.IntegerType(), True),
            T.StructField("offset_ms", T.LongType(), True),
            T.StructField("frame_hash", T.StringType(), True),
        ]
    )
    id_name, data_name = id_col, data_col

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for item_id, data in zip(pdf[id_name], pdf[data_name]):
                data = bytes(data) if data is not None else b""
                n_frames = 1 + hashlib.md5(data).digest()[0] % 4
                for i in range(n_frames):
                    rows.append(
                        {
                            "item_id": int(item_id),
                            "frame_idx": i,
                            "offset_ms": i * every_ms,
                            "frame_hash": hashlib.md5(data + i.to_bytes(4, "big")).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select(id_col, data_col).mapInPandas(compute, schema)


def attach_media_metadata(df: DataFrame, data_col: str) -> DataFrame:
    """Typed metadata struct next to the binary column (JVM-side; no
    Python): mime sniffing from magic bytes + sizes."""
    data = F.col(data_col)
    magic = F.hex(F.substring(data, 1, 4))
    mime = (
        F.when(magic.startswith("FFD8"), F.lit("image/jpeg"))
        .when(magic.startswith("89504E47"), F.lit("image/png"))
        .when(magic.startswith("47494638"), F.lit("image/gif"))
        .when(magic.startswith("52494646"), F.lit("audio/wav"))
        .otherwise(F.lit("application/octet-stream"))
    )
    meta = F.struct(
        mime.alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    return df.withColumn("media_meta", meta).withColumn(
        "media_bytes_len", F.length(data).cast("long")
    )
