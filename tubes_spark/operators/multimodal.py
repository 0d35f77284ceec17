"""Multimodal (image/audio/video) column plumbing.

Media ride through the engine as opaque ``binary`` columns + a typed
metadata struct.  The Spark-side plumbing (schemas, Arrow-batched
mapInPandas, partition sizing) is real and tested; the actual codec
work is STUBBED (pillow/librosa/etc. are not in this container) behind
``decoder=`` hooks — a deterministic fake decoder is provided so the
batch shape / schema path is exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, StringType, StructField, StructType,
)

MEDIA_META = StructType([
    StructField("mime", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("feature", ArrayType(FloatType())),
    StructField("n_bytes", IntegerType()),
])


def fake_decode(data: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for an image/audio decoder: derives a
    feature vector from the md5 of the payload.  Replace with a real
    codec (PIL/librosa) in production — same signature."""
    h = hashlib.md5(data or b"").digest()
    return [h[i % len(h)] / 255.0 for i in range(dim)]


def extract_features(
    df: DataFrame,
    id_col: str = "media_id",
    bytes_col: str = "content",
    dim: int = 8,
    decoder: Callable[[bytes], list[float]] | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns.

    mapInPandas keeps decode work executor-side and batch-shaped; at
    100 TB the binary column never moves through the driver and each
    task holds only one Arrow batch in memory.  Raises NotImplementedError
    from the default decoder ONLY if a real codec is requested; the
    deterministic fake keeps plumbing testable in this container."""
    dec = decoder or (lambda b: fake_decode(b, dim))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({
                "media_id": pdf[id_col].astype(str),
                "feature": [dec(bytes(x) if x is not None else b"") for x in pdf[bytes_col]],
                "n_bytes": [len(x) if x is not None else 0 for x in pdf[bytes_col]],
            })
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def real_decode_stub(data: bytes) -> list[float]:
    """The production decoder slot — deliberately unimplemented here
    (no image/audio libraries in this container)."""
    raise NotImplementedError(
        "real media decoding needs PIL/librosa/ffmpeg; wire your codec into "
        "extract_features(decoder=...)"
    )


def frame_sample_plan(df: DataFrame, every_ms: int, bytes_col: str = "content") -> DataFrame:
    """Video frame-sampling *plan* shape: explode per-frame offsets from
    metadata (real frame grab stubbed).  Demonstrates the schema and the
    explode-based row fan-out that a real sampler would use."""
    return df.select(
        "*",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
