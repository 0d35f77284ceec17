"""Physical layout & global-ordering tools (north-star extension; the
reference has no ordering ops beyond arrival order — SURVEY.md §2.8).

Training-data export needs three things Spark does not hand you
directly at scale:

* globally *contiguous* row ids (``assign_contiguous_ids``) without
  funneling the table through one partition,
* a reproducible global shuffle into shards (``shuffle_manifest``)
  that is a pure projection + partitioned window, and
* interval joins with NO equi-key carrier (``binned_range_join`` in
  joins.py) that stay hash joins instead of nested loops.

All three are built from built-in exprs — no UDFs, no driver loops
beyond a bounded per-partition count table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_contiguous_ids(
    df: DataFrame, order_col: str, n_parts: int = 16, out_col: str = "global_id"
) -> DataFrame:
    """Assign ids 0..N-1 in ``order_col`` order WITHOUT a single-
    partition global sort.

    The naive ``row_number() OVER (ORDER BY c)`` plans an
    ``Exchange SinglePartition`` — one task sorts the whole table,
    the exact anti-pattern at 100 TB.  Instead, the classic two-pass:

    1. ``repartitionByRange(order_col)`` — range exchange; partition
       index order equals key-range order by construction.
    2. ``row_number`` within each partition (partitioned window — no
       global exchange).
    3. per-partition counts -> cumulative offsets.  This table has
       exactly ``n_parts`` rows, so the tiny single-partition window
       over it is bounded by the partition COUNT, not the data; it is
       then broadcast back.

    Ids are independent of where the sampled range boundaries land
    (only the total order of ``order_col`` matters), so the result is
    deterministic across runs even though RangePartitioner samples.
    ``order_col`` must be unique for a stable total order.
    """
    ranged = df.repartitionByRange(n_parts, F.col(order_col)).withColumn(
        "__pid__", F.spark_partition_id()
    )
    w = Window.partitionBy("__pid__").orderBy(order_col)
    ranked = ranged.withColumn("__rn__", F.row_number().over(w))
    # n_parts rows: the one place a single-partition window is fine
    counts = ranged.groupBy("__pid__").agg(F.count("*").alias("__n__"))
    off_w = Window.orderBy("__pid__").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "__off__", F.coalesce(F.sum("__n__").over(off_w), F.lit(0))
    ).select("__pid__", "__off__")
    out = ranked.join(F.broadcast(offsets), "__pid__").withColumn(
        out_col, (F.col("__off__") + F.col("__rn__") - 1).cast("long")
    )
    return out.drop("__pid__", "__rn__", "__off__")


def shuffle_manifest(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: str = "42",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Reproducible global shuffle for training order: place each row
    at a pseudo-random (shard, position) derived ONLY from its key.

    ``md5(key || ':' || seed)`` gives a uniform, engine-portable hash;
    the shard is 16 bits of it, the position is a row_number over the
    hex digest WITHIN the shard — a partitioned window, so the sort is
    per-shard, never global.  Same contract as split_train_test_hash:
    no RNG state, stable under re-runs/repartitioning, linear scan +
    one shuffle on the shard key.
    """
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(":" + seed)))
    shard = (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % n_shards).cast("int")
    tagged = df.withColumn("__h__", h).withColumn(shard_col, shard)
    w = Window.partitionBy(shard_col).orderBy("__h__", key_col)
    return tagged.withColumn(pos_col, (F.row_number().over(w) - 1).cast("long")).drop(
        "__h__"
    )
