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


from contextlib import contextmanager

# The r7 three-way skew probe's finding (SCALE_PROBE.json.skew_join):
# AQE's runtime skew split beats explicit salting (2.24x vs 1.77x over
# the naive plan) — but ONLY once the split threshold is scaled to the
# actual hot-partition size; the 256MB default never fires below
# cluster scale.  These are the probed values.
AQE_SKEW_TUNING = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8MB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4MB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
}


@contextmanager
def aqe_skew_tuning(spark, **overrides):
    """Apply the probed AQE skew-split conf for the duration of the
    block, restoring every key after.  Conf is read at ACTION time, so
    the join must EXECUTE inside the block (collect/count/write/
    localCheckpoint) — a lazily returned DataFrame executed outside
    gains nothing."""
    conf = {**AQE_SKEW_TUNING, **{k: str(v) for k, v in overrides.items()}}
    saved: dict = {}
    for k, v in conf.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def skew_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    strategy: str = "aqe",
    n_salts: int = 16,
    **tuned,
) -> DataFrame:
    """Skewed equi-join with an explicit mitigation strategy.

    ``strategy='aqe'`` (the probe's winner, 2.24x vs naive): runs the
    plain join EAGERLY under :func:`aqe_skew_tuning` — the engine's
    runtime skew split carves the hot partition into advisory-sized
    pieces (``skew=true`` in the adaptive plan) — and returns the
    result pinned via ``localCheckpoint`` so the tuned conf can be
    restored immediately.  Prefer this when the result feeds further
    stages; for a terminal write, use ``with aqe_skew_tuning(spark):``
    around the write instead to avoid materializing twice.

    ``strategy='salt'`` (2nd place, 1.77x, but works even where AQE
    cannot see the skew — e.g. bucketed SMJ plans AQE won't touch):
    :func:`salted_broadcast_left`, lazy as usual."""
    if strategy == "salt":
        return salted_broadcast_left(big, small, on, n_salts=n_salts)
    if strategy != "aqe":
        raise ValueError(f"strategy must be 'aqe' or 'salt', got {strategy!r}")
    with aqe_skew_tuning(big.sparkSession, **tuned):
        return big.join(small, list(on)).localCheckpoint(eager=True)


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
