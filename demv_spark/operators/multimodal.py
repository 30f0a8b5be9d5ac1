"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode kernels (PIL/ffmpeg/librosa) are NOT available in this
container, so the decode step is stubbed behind a deterministic fake
(or NotImplementedError for the real-codec path) — but the Spark-side
plumbing is real and tested: schemas, Arrow-batched `mapInPandas`
signatures, batch shapes, and partition sizing are exactly what a
production decode pipeline uses; only the innermost bytes→pixels call
swaps out.

Design for 100 TB of media:
- media rows are wide (MBs) → repartition so batches stay within
  executor memory; `spark.sql.files.maxPartitionBytes` and
  `maxRecordsPerBatch` bound Arrow transfer, not row counts.
- metadata travels in plain columns so filters (format, duration,
  size) push down to parquet without touching payloads — payload
  column pruning is the single biggest scan saver.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# canonical multimodal schema: payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),     # image | audio | video
        StructField("format", StringType(), True),    # png | wav | mp4 ...
        StructField("payload", BinaryType(), True),   # opaque bytes
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("feature", ArrayType(FloatType()), True),
        StructField("feat_dim", IntegerType(), True),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, kind: str = "image") -> DataFrame:
    """Deterministic fake media table from any id column — payload is
    a seeded byte blob so tests have real binary data to push through
    the pipeline. Pure column expressions."""
    payload = F.sha2(F.col(id_col).cast("string"), 256).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.lit("fake").alias("format"),
        payload.alias("payload"),
        (F.pmod(F.col(id_col), F.lit(64)) + 16).cast("int").alias("width"),
        (F.pmod(F.col(id_col), F.lit(48)) + 16).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """STUB decode: deterministic feature vector from payload bytes.

    A real pipeline replaces this one function with PIL/ffmpeg decode +
    model inference; everything around it (batching, schema, shuffle
    boundaries) is production-shaped. Raises NotImplementedError for
    codec formats to make the stub boundary explicit."""
    h = hashlib.sha256(payload).digest()
    out = []
    for i in range(dim):
        chunk = h[(4 * i) % 28 : (4 * i) % 28 + 4]
        (v,) = struct.unpack(">I", chunk)
        out.append((v % 10_000) / 10_000.0)
    return out


def extract_features(
    df: DataFrame, dim: int = 16, real_codecs: bool = False
) -> DataFrame:
    """Decode/feature-extract media payloads via Arrow-batched
    mapInPandas — the production shape for Python-side media work:
    each batch is a pandas DataFrame, payloads stay binary end-to-end,
    output schema is fixed and columnar."""
    if real_codecs:
        raise NotImplementedError(
            "image/audio codecs not available in this environment; "
            "swap _fake_decode for a real decoder"
        )

    def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _fake_decode(p if p is not None else b"", dim) for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "feat_dim": dim,
                }
            )

    return df.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)


def resize_plan(df: DataFrame, max_side: int = 224) -> DataFrame:
    """Resize bookkeeping (target dims, scale factor) computed as pure
    columns — the byte-level resample lives inside extract_features'
    decode stub. Keeping geometry in columns lets Catalyst prune/filter
    on it without touching payloads."""
    scale = F.least(
        F.lit(max_side) / F.col("width"), F.lit(max_side) / F.col("height"), F.lit(1.0)
    )
    return df.withColumn("scale", scale).withColumn(
        "target_width", F.ceil(F.col("width") * F.col("scale")).cast("int")
    ).withColumn(
        "target_height", F.ceil(F.col("height") * F.col("scale")).cast("int")
    )


def frame_sample_plan(
    df: DataFrame, every_ms: int = 1000, max_frames: int = 32
) -> DataFrame:
    """Video frame-sampling plan: explode per-media frame timestamps
    (bounded by max_frames) — the downstream decode consumes
    (media_id, frame_ts_ms) pairs. Pure sequence/explode, no UDF."""
    n_frames = F.least(
        F.floor(F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms) + 1,
        F.lit(max_frames),
    ).cast("int")
    ts = F.transform(
        F.sequence(F.lit(0), n_frames - 1), lambda i: (i * every_ms).cast("int")
    )
    return df.select(
        "media_id", "kind", F.explode(ts).alias("frame_ts_ms")
    )
