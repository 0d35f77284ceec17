"""Folds & running aggregates.

Reference: ``reduce`` (Tubes/Source.hs:167-174) is a whole-stream strict
left fold; ``lfold`` (Tubes/Util.hs:174-181) is the *resumable* variant;
the Channel docs show running sum / running average accumulators
(Tubes/Channel.hs:46-76).  Spark generalization: grouped hash aggregates
(partial map-side combine + final — constant memory like the fold) and
window-function prefix scans.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def fold(df: DataFrame, *aggs: Column) -> DataFrame:
    """Whole-stream fold — ``reduce`` (Tubes/Source.hs:167-174).
    Hash aggregate: partial per partition, final single-row combine."""
    return df.agg(*aggs)


def fold_by(df: DataFrame, keys: Sequence[str | Column], *aggs: Column) -> DataFrame:
    """Grouped fold (north-star generalization of reduce): shuffles once
    on the grouping keys with map-side partial aggregation."""
    return df.groupBy(*keys).agg(*aggs)


def running_by(
    df: DataFrame,
    keys: Sequence[str],
    order_by: str | Column,
    **running: Column,
) -> DataFrame:
    """Per-key running accumulator — the reference's stateful channel
    (running sum/avg, Tubes/Channel.hs:46-76) keyed for scale.

    A per-key prefix window parallelizes across keys (each key's
    partition sorts locally); the unkeyed reference semantics is the
    degenerate single-key case (Source.running)."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumns({name: c.over(w) for name, c in running.items()})


def fold_expr(df: DataFrame, arr: Column, init: Column, merge, alias: str = "result") -> DataFrame:
    """Per-row array fold via ``F.aggregate`` — JVM-side lambda, no UDF.
    Mirrors lfold's (step, init) shape on array columns."""
    return df.select(F.aggregate(arr, init, merge).alias(alias))
