"""Multimodal column operators: image/audio/video as opaque BINARY
columns with typed metadata.

Design for 100 TB: media bytes ride in parquet BINARY columns (or
pointers to object storage); all per-item compute is Arrow-batched
Python (``mapInPandas``) so bytes cross the JVM/Python boundary once per
batch, never per row. Partitioning is inherited from the scan — media
work is embarrassingly parallel, so there is NO shuffle in any operator
here.

Decoding is pluggable (``set_decoder`` installs e.g. a PIL-backed
decoder where that exists). The DEFAULT decoder is real for the
dependency-free baseline formats in operators/codecs.py — PPM/BMP pixels
(true dimensions + channel means), PCM16 WAV (true duration), and the
PPMV frame container — and falls back to a clearly-marked DETERMINISTIC
STUB for containers this environment cannot parse (jpeg/mp4/...), so
the Spark-side plumbing is exercised either way.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hudi_rs_spark.operators import codecs

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


_NULL_DECODE = {
    "width": None, "height": None, "mean_r": None, "mean_g": None, "mean_b": None
}


def _stub_decode(data: bytes) -> dict:
    """Deterministic fake decode for formats codecs.py cannot parse:
    pseudo dimensions + channel means from the content hash."""
    if data is None:
        return dict(_NULL_DECODE)
    h = hashlib.md5(data).digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "mean_r": h[2] / 255.0,
        "mean_g": h[3] / 255.0,
        "mean_b": h[4] / 255.0,
    }


def default_decode(data: bytes) -> dict:
    """REAL pixel decode for the baseline formats (PPM/BMP: true
    dimensions + per-channel means; PPMV: first frame; WAV: no pixels),
    stub for anything else."""
    kind = codecs.sniff(data)
    if kind is None:
        return _stub_decode(data)
    if kind == "wav":
        return dict(_NULL_DECODE)
    # A payload that passes the magic sniff can still be truncated
    # mid-header or carry garbage dimensions; decode failures must not
    # fail the executor task — fall back to the stub like unknown formats.
    try:
        if kind == "ppmv":
            _, frames = codecs.decode_ppmv(data)
            if not frames:
                return dict(_NULL_DECODE)
            arr = frames[0]
        elif kind == "ppm":
            arr = codecs.decode_ppm(data)
        else:
            arr = codecs.decode_bmp(data)
    except (struct.error, ValueError):
        return _stub_decode(data)
    means = arr.reshape(-1, 3).mean(axis=0) / 255.0
    return {
        "width": int(arr.shape[1]),
        "height": int(arr.shape[0]),
        "mean_r": float(means[0]),
        "mean_g": float(means[1]),
        "mean_b": float(means[2]),
    }


_DECODER: Callable[[bytes], dict] = default_decode


def set_decoder(fn: Callable[[bytes], dict]) -> None:
    global _DECODER
    _DECODER = fn


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


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def audio_features(df: DataFrame, id_col: str, data_col: str) -> DataFrame:
    """Per-clip audio features via mapInPandas: REAL PCM16 WAV decode
    (rate, channels, duration, RMS amplitude); non-WAV rows get nulls."""
    id_name, data_name = id_col, data_col

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for item_id, data in zip(pdf[id_name], pdf[data_name]):
                data = bytes(data) if data is not None else None
                feat = {
                    "item_id": int(item_id),
                    "n_bytes": len(data) if data is not None else 0,
                    "sample_rate": None,
                    "n_channels": None,
                    "duration_ms": None,
                    "rms": None,
                }
                try:
                    decoded = (
                        codecs.decode_wav(data)
                        if codecs.sniff(data) == "wav"
                        else None
                    )
                except (struct.error, ValueError):
                    decoded = None  # truncated/garbage container: keep nulls
                if decoded is not None:
                    rate, ch, samples = decoded
                    feat.update(
                        sample_rate=int(rate),
                        n_channels=int(ch),
                        duration_ms=int(len(samples) * 1000 // rate),
                        rms=float(
                            np.sqrt(np.mean(samples.astype("float64") ** 2))
                        ),
                    )
                rows.append(feat)
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return df.select(id_col, data_col).mapInPandas(compute, AUDIO_FEATURES_SCHEMA)


def resize_images(df: DataFrame, id_col: str, data_col: str, target: int = 224) -> DataFrame:
    """Binary-in/binary-out resize via mapInPandas: REAL nearest-neighbor
    resampling for the baseline formats (PPM/BMP in, P6 PPM out at
    target x target); unparseable containers pass through unchanged with
    ``resized`` = false."""
    schema = T.StructType(
        [
            T.StructField("item_id", T.LongType(), True),
            T.StructField("data", T.BinaryType(), True),
            T.StructField("target_size", T.IntegerType(), True),
            T.StructField("resized", T.BooleanType(), True),
        ]
    )
    id_name, data_name = id_col, data_col

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for item_id, data in zip(pdf[id_name], pdf[data_name]):
                data = bytes(data) if data is not None else None
                kind = codecs.sniff(data)
                if kind in ("ppm", "bmp"):
                    try:
                        arr = (
                            codecs.decode_ppm(data)
                            if kind == "ppm"
                            else codecs.decode_bmp(data)
                        )
                    except (struct.error, ValueError):
                        # Sniff-passing but truncated/garbage: pass through
                        # unchanged instead of failing the task.
                        rows.append((int(item_id), data, target, False))
                        continue
                    out = codecs.encode_ppm(codecs.resize_nearest(arr, target, target))
                    rows.append((int(item_id), out, target, True))
                else:
                    rows.append((int(item_id), data, target, False))
            yield pd.DataFrame(
                rows, columns=["item_id", "data", "target_size", "resized"]
            )

    return df.select(id_col, data_col).mapInPandas(compute, schema)


def frame_sample(
    df: DataFrame, id_col: str, data_col: str, every_ms: int = 1000
) -> DataFrame:
    """Video frame sampling: one row in -> N frame rows out (mapInPandas
    naturally expresses 1->N). PPMV containers demux for REAL — one
    output row per ``every_ms`` of video, frame_hash = md5 of the actual
    sampled frame's pixels; other containers fall back to deterministic
    stub offsets derived from the content hash."""
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
                if codecs.sniff(data) == "ppmv":
                    # Bad containers must not fail the executor task: a
                    # payload that passes the magic sniff can still be
                    # truncated mid-header (struct.error) or carry garbage
                    # dimensions (ValueError); degenerate-but-parseable
                    # ones (zero frames, frame_ms<=0) are filtered below.
                    # All fall through to the stub path.
                    try:
                        frame_ms, frames = codecs.decode_ppmv(data)
                    except (struct.error, ValueError):
                        frame_ms, frames = 0, []
                    if frames and frame_ms > 0:
                        duration = frame_ms * len(frames)
                        i = 0
                        for off in range(0, max(duration, 1), every_ms):
                            j = min(off // frame_ms, len(frames) - 1)
                            rows.append(
                                {
                                    "item_id": int(item_id),
                                    "frame_idx": i,
                                    "offset_ms": i * every_ms,
                                    "frame_hash": hashlib.md5(
                                        frames[j].tobytes()
                                    ).hexdigest(),
                                }
                            )
                            i += 1
                        continue
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
