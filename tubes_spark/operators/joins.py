"""Join strategies (north-star extension; the reference has no joins —
SURVEY.md §2.8 — its only binary ops are merge/concat/cartesian).

Scale playbook:

* dimension tables (region/nation/customer/supplier/part) -> broadcast
  hash join: no shuffle of the fact side.
* fact-fact -> sort-merge on the join key; AQE handles skew splitting.
* as-of (time-series) -> the union/window trick below: ONE shuffle on
  the partition key, no range-explosion, no per-row python.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def broadcast_join(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Broadcast-hash join: ship the small side to every executor so the
    fact table never shuffles."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def sort_merge_join(left: DataFrame, right: DataFrame, on, how: str = "inner") -> DataFrame:
    """Shuffle join for two large inputs.  With AQE on, Spark converts
    to broadcast at runtime if a side turns out small, and splits skewed
    partitions."""
    return left.hint("merge").join(right.hint("merge"), on=on, how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on_time: str,
    by: Sequence[str] = (),
    right_cols: Sequence[str] = (),
    suffix: str = "_r",
    tolerance: float | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the most recent right row with
    ``right.on_time <= left.on_time`` (per ``by`` key).

    Implementation (scales to any size): tag both sides, union, then a
    single per-key window ``last(right_value, ignorenulls=True)`` over
    time order gives every left row its prevailing right match — one
    shuffle on ``by``, no range join explosion, no python.
    """
    by = list(by)
    right_cols = list(right_cols) or [c for c in right.columns if c not in (*by, on_time)]

    lt = left.withColumn("__side__", F.lit(1))
    # tiebreak orders equal-time RIGHT rows deterministically (largest wins),
    # so the right side's value must ride through the union
    tb_cols = []
    if tiebreak is not None:
        if tiebreak not in right.columns:
            raise ValueError(f"tiebreak {tiebreak!r} not in right columns")
        tb_cols = [F.col(tiebreak).alias("__tb__")]
    rt = right.select(
        *by,
        F.col(on_time),
        *[F.col(c) for c in right_cols],
        *tb_cols,
    ).withColumn("__side__", F.lit(0))
    if tiebreak is not None:
        lt = lt.withColumn("__tb__", F.lit(None).cast(rt.schema["__tb__"].dataType))

    # align schemas: left keeps its payload, right contributes right_cols
    # (rename right payload FIRST so shared column names don't collide)
    rt2 = rt.withColumnsRenamed({c: f"__r_{c}" for c in right_cols})
    for c in right_cols:
        lt = lt.withColumn(f"__r_{c}", F.lit(None).cast(rt.schema[c].dataType))
    for c in left.columns:
        if c not in (*by, on_time):
            rt2 = rt2.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = lt.unionByName(rt2.select(lt.columns))

    # right rows sort before left rows at equal timestamps => "<=" semantics
    order = [F.col(on_time).asc(), F.col("__side__").asc()]
    if tiebreak is not None:
        order.append(F.col("__tb__").asc_nulls_first())
    w = Window.partitionBy(*by).orderBy(*order)
    filled = u.withColumns(
        {f"__r_{c}": F.last(F.when(F.col("__side__") == 0, F.col(f"__r_{c}")), ignorenulls=True).over(w)
         for c in right_cols}
    ).withColumn("__r_time__", F.last(F.when(F.col("__side__") == 0, F.col(on_time)), ignorenulls=True).over(w))

    out = filled.filter(F.col("__side__") == 1)
    if tolerance is not None:
        within = (F.unix_timestamp(F.col(on_time)) - F.unix_timestamp(F.col("__r_time__"))) <= tolerance
        out = out.withColumns(
            {f"__r_{c}": F.when(within, F.col(f"__r_{c}")) for c in right_cols}
        )
    renames = {f"__r_{c}": f"{c}{suffix}" for c in right_cols}
    out = out.withColumnsRenamed(renames).drop("__side__", "__r_time__", "__tb__")
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: Column,
    right_lo: Column,
    right_hi: Column,
    by=None,
) -> DataFrame:
    """Interval join: left.point in [right.lo, right.hi).  Declared as a
    plain theta join so Catalyst can use the range-join strategies; for
    heavy skew pre-bucket the point column (see dedup.salting note).

    With an equi ``by`` carrier this stays a hash join; WITHOUT one it
    degenerates to BroadcastNestedLoopJoin — use ``binned_range_join``
    for that case at scale."""
    cond = (left_point >= right_lo) & (left_point < right_hi)
    if by is not None:
        cond = cond & by
    return left.join(right, on=cond)


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo_ts: str,
    hi_ts: str,
    bin_seconds: int,
) -> DataFrame:
    """No-equi-key interval join that stays a HASH join: manufacture the
    equi key by quantizing time into fixed bins.

    Each interval [lo, hi) is exploded into every ``bin_seconds`` bin it
    overlaps; each point lands in exactly ONE bin; joining on the bin is
    an ordinary shuffled/broadcast hash join, and the residual exact
    predicate filters bin-edge false positives.  Per (point, interval)
    match the pair appears exactly once (the point's single bin), so no
    dedup pass is needed.

    Cost model at 100 TB: interval expansion factor is
    ceil(len/bin_seconds)+1 — pick bins near the median interval length
    so the blowup is ~2-3x on the SMALL side while the big point side
    never replicates.  The nested-loop alternative is O(|P| * |I|).

    Bin math runs on microseconds (``unix_micros``), not whole seconds:
    an interval whose ``hi`` has fractional seconds (hi = 12.5s) must
    still emit its final bin, else points with ts in [floor(hi), hi)
    silently drop and the exactly-once contract breaks.
    """
    bin_us = bin_seconds * 1_000_000
    binned_iv = intervals.withColumn(
        "__bin__",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(lo_ts)) / bin_us),
                F.floor((F.unix_micros(F.col(hi_ts)) - 1) / bin_us),
            )
        ),
    )
    binned_pt = points.withColumn(
        "__bin__", F.floor(F.unix_micros(F.col(point_ts)) / bin_us)
    )
    out = binned_pt.join(binned_iv, "__bin__").filter(
        (F.col(point_ts) >= F.col(lo_ts)) & (F.col(point_ts) < F.col(hi_ts))
    )
    return out.drop("__bin__")
