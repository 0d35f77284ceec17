"""Event-time windowed aggregation (north-star extension; the reference
has no event time — ordering is arrival order, SURVEY.md §2.8).

All three window kinds use Spark's native ``window`` / ``session_window``
expressions, which work identically on batch DataFrames and Structured
Streaming (with watermarks) — one shuffle on (key, window).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling(df: DataFrame, ts: str, size: str, keys: Sequence[str] = (), *aggs: Column) -> DataFrame:
    """Fixed non-overlapping windows of ``size`` (e.g. '1 hour')."""
    return df.groupBy(F.window(ts, size).alias("win"), *keys).agg(*aggs)


def sliding(df: DataFrame, ts: str, size: str, slide: str, keys: Sequence[str] = (), *aggs: Column) -> DataFrame:
    """Overlapping windows: each event lands in size/slide windows."""
    return df.groupBy(F.window(ts, size, slide).alias("win"), *keys).agg(*aggs)


def session(df: DataFrame, ts: str, gap: str, keys: Sequence[str] = (), *aggs: Column) -> DataFrame:
    """Session windows: events closer than ``gap`` merge into one
    session per key."""
    return df.groupBy(F.session_window(ts, gap).alias("win"), *keys).agg(*aggs)


def with_watermark(df: DataFrame, ts: str, delay: str) -> DataFrame:
    """Late-data bound for streaming aggregation state eviction."""
    return df.withWatermark(ts, delay)


def rollup_hierarchy(
    df: DataFrame,
    ts: str,
    levels: Sequence[str],
    keys: Sequence[str] = (),
    sum_col: str | None = None,
) -> DataFrame:
    """Hypertable-style multi-resolution rollup: aggregate the base data
    once at the finest level, then derive every coarser level by
    re-aggregating the PREVIOUS level's partials — at 100 TB the daily
    rollup reads 24 hourly rows per key, not 86M raw events.

    ``levels`` are date_trunc units fine->coarse (e.g. ['hour','day',
    'week']).  Emits (level, bucket_start, keys..., n, total): counts
    sum across levels; the decimal partial sums merge exactly."""
    finest, *coarser = levels
    val = F.col(sum_col).cast("decimal(27,6)") if sum_col else F.lit(1).cast("decimal(27,6)")
    cur = (
        df.groupBy(F.date_trunc(finest, F.col(ts)).alias("bucket"), *keys)
        .agg(F.count(F.lit(1)).alias("n"), F.sum(val).alias("total"))
        .withColumn("level", F.lit(finest))
    )
    out = cur
    for unit in coarser:
        cur = (
            cur.groupBy(F.date_trunc(unit, F.col("bucket")).alias("bucket"), *keys)
            .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
            .withColumn("level", F.lit(unit))
        )
        out = out.unionByName(cur)
    return out.select("level", "bucket", *keys, "n", F.col("total").cast("double").alias("total"))
