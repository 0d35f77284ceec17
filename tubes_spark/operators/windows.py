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
