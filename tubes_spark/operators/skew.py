"""Skew mitigation: salted two-phase aggregation & salted joins.

AQE's skew-join splitting handles *join* skew at runtime, but a
groupBy whose hottest key holds 20% of 100 TB still funnels that key's
rows into one reducer.  The classic fix is salting: spray each key
across ``n_salts`` sub-keys, partially aggregate, then combine the
sub-aggregates — two narrow shuffles, each with bounded per-task input.

Only decomposable aggregates (sum/count/min/max + anything expressible
as (partial, merge) pairs) can be salted this way; avg is derived from
(sum, count).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_salt(n_salts: int) -> Column:
    """Per-row salt with full entropy regardless of input partitioning.

    ``spark_partition_id() % n`` (the naive choice) degenerates to ONE
    salt value on a single-partition input — e.g. a table written as one
    parquet file — so the hot key still funnels.  Hashing the row's
    ``monotonically_increasing_id`` spreads rows evenly even inside one
    partition (sequential ids -> xxhash64 avalanche) and costs no extra
    column reads.  Salt placement is not required to be stable across
    recomputes: aggregate/join results are salt-invariant by
    construction, only per-bucket sizing depends on it."""
    return F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).alias("__salt__")


def salted_fold_by(
    df: DataFrame,
    keys: Sequence[str],
    n_salts: int = 16,
    **aggs: tuple[Column, str],
) -> DataFrame:
    """Two-phase salted grouped fold.

    ``aggs`` maps output name -> (partial aggregate column, merge fn
    name): e.g. ``total=(F.sum('x'), 'sum')``, ``n=(F.count(F.lit(1)),
    'sum')``, ``mx=(F.max('x'), 'max')``.

    Phase 1 groups by (keys..., salt) — the hot key's rows split across
    n_salts reducers; phase 2 merges the n_salts partials per key.  The
    phase-2 shuffle moves at most |distinct keys| * n_salts rows."""
    salt = _row_salt(n_salts)
    phase1 = df.groupBy(*keys, salt).agg(
        *[c.alias(name) for name, (c, _m) in aggs.items()]
    )
    merge = {"sum": F.sum, "min": F.min, "max": F.max, "count": F.sum}
    return phase1.groupBy(*keys).agg(
        *[merge[m](name).alias(name) for name, (_c, m) in aggs.items()]
    )


def salted_broadcast_left(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
) -> DataFrame:
    """Skew-proof equi-join of a big skewed table against a small one:
    replicate the small side n_salts times, salt the big side's key —
    every (key, salt) bucket is bounded.  Prefer plain ``broadcast()``
    when the small side fits in memory (this is for when it ALMOST fits
    and AQE's skew split can't kick in, e.g. bucketed SMJ plans)."""
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias("__salt__")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn("__salt__", _row_salt(n_salts))
    return big_salted.join(small_rep, [*on, "__salt__"]).drop("__salt__")
