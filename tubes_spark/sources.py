"""Batch source/sink formats — the engine's IO surface.

The reference's only IO is ``prompt`` (stdin lines, Tubes.hs:182-189)
and ``display`` (stdout, Tubes.hs:193-196); everything else arrives via
``each`` over in-memory containers (Tubes/Util.hs:76-77).  A data
engine needs real formats: these wrappers pin the scale-relevant
options (schema always explicit on read — schema inference reads the
data twice; compression; partition pruning columns on write).

Streaming sources live in tubes_spark.streaming.run.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet: self-describing schema + min/max pruning + predicate
    pushdown.  The default interchange format."""
    return spark.read.parquet(path)


def read_csv(spark: SparkSession, path: str, schema: str, header: bool = True,
             sep: str = ",") -> DataFrame:
    """CSV with an explicit schema — inferSchema would scan the data
    twice, and type drift across files is silent corruption at 100 TB."""
    return (
        spark.read.format("csv")
        .schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .load(path)
    )


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines with explicit schema (same rationale as CSV)."""
    return spark.read.format("json").schema(schema).load(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Line-per-row text — the batch analog of the reference's
    ``prompt`` stdin source (Tubes.hs:182-189)."""
    return spark.read.text(path)


# Format coverage note: Avro is an EXTERNAL Spark module (spark-avro jar)
# not shipped in this container — wire it via
# --packages org.apache.spark:spark-avro_2.13:<ver> on a real cluster and
# the same read/write pattern applies; Delta/Iceberg likewise ride their
# own catalogs.  Everything in this module is built into Spark core.


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC: the other columnar built-in — same pushdown/pruning story as
    parquet (plus bloom filters where written)."""
    return spark.read.orc(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: Sequence[str] = (),
                  compression: str = "zstd") -> None:
    """Partitioned parquet write: ``partition_by`` columns become
    directory-level partition pruning for every downstream reader."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              partition_by: Sequence[str] = (),
              compression: str = "zstd") -> None:
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def size_buckets(df: DataFrame, target_bucket_mb: int = 128,
                 min_buckets: int = 8, max_buckets: int = 4096) -> int:
    """Derive a bucket count from the input's optimizer size estimate
    (post-pruning bytes / ``target_bucket_mb``), clamped to
    [min, max].  A FIXED bucket count is the classic bucketing mistake:
    right at one corpus size, write-bound at 100x (too few tasks) or
    small-file-bound at 0.01x (too many near-empty files).

    ADVICE r8: the optimizer estimate comes through a private API, so
    its failure must not silently revert to the fixed-count behavior
    that caused the r7 x100 write outlier — when it is unusable we
    fall to a SECONDARY size source (the scan's input file status via
    the public ``inputFiles()``, scaled ~3x for parquet decompression)
    and only then to ``min_buckets``, warning on both demotions so the
    degradation is visible in logs."""
    import math
    import os as _os
    import warnings

    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        size = 0
    if size <= 0 or size >= (1 << 60):  # unknown / default-sentinel stats
        size = 0
        try:
            paths = [p[len("file:"):] if p.startswith("file:") else p
                     for p in df.inputFiles()]
            disk = sum(_os.path.getsize(p) for p in paths if _os.path.exists(p))
            size = disk * 3  # on-disk parquet -> rough in-memory bytes
        except Exception:
            size = 0
        if size <= 0:
            warnings.warn(
                "size_buckets: no optimizer estimate and no readable input "
                f"file status; falling back to min_buckets={min_buckets} — "
                "pass n_buckets explicitly for corpus-sized bucketing",
                RuntimeWarning,
                stacklevel=2,
            )
            return min_buckets
        warnings.warn(
            "size_buckets: optimizer size estimate unusable; derived bucket "
            "count from input file status instead",
            RuntimeWarning,
            stacklevel=2,
        )
    return max(min_buckets,
               min(max_buckets, math.ceil(size / (target_bucket_mb * 1024 * 1024))))


def write_bucketed(df: DataFrame, table: str, bucket_cols: Sequence[str],
                   n_buckets: int | None = None, path: str | None = None,
                   sort_cols: Sequence[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Bucketed table write: rows are hash-partitioned into ``n_buckets``
    files on ``bucket_cols`` and registered in the catalog.  Two tables
    bucketed the same way join WITHOUT a shuffle — at 100 TB this turns
    the recurring fact-fact join (lineitem x orders on orderkey) from
    the dominant network cost into a local zipper merge.
    ``sort_cols`` additionally pre-sorts within buckets so the join can
    skip its sort.  Bucketing requires the table catalog
    (``saveAsTable``); ``path`` makes it an external table there.

    ``n_buckets=None`` sizes buckets to the CORPUS (:func:`size_buckets`)
    instead of a fixed count — the number a 100x-bigger input needs is
    100x bigger, and hard-coding it was exactly the r7 x100 probe's
    35.9x write outlier.

    The pre-``repartition`` below is load-bearing: ``bucketBy`` writes
    one file per bucket PER UPSTREAM TASK, so a 400-partition scan into
    8 buckets would emit 3,200 near-empty files (a listing/NameNode
    problem AND a downstream one-task-per-file scheduling problem).
    Spark's repartition hash (murmur3 pmod n) is the same function
    bucketBy uses, so repartitioning onto ``n_buckets`` tasks aligns
    tasks 1:1 with buckets — exactly one file per bucket, and the write
    parallelism IS the bucket count."""
    if n_buckets is None:
        n_buckets = size_buckets(df)
    w = (df.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
         .write.mode(mode).bucketBy(n_buckets, *bucket_cols))
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucketing metadata (and therefore shuffle-free
    joins) only survives through the catalog, not raw parquet paths."""
    return spark.table(table)


def compact_files(spark: SparkSession, path: str, out_path: str,
                  target_mb: int = 256, fmt: str = "parquet") -> int:
    """Small-file compaction: rewrite a directory into ceil(bytes/target)
    files.  Streaming sinks and over-parallel writers leave thousands of
    KB-scale files; at 100 TB that is a NameNode/listing problem AND a
    scan-task-scheduling problem (one task per file).  Sizing from the
    actual on-disk bytes (not row counts) keeps output files near the
    rowgroup-friendly target regardless of compression ratio.  Returns
    the file count written.  Run periodically per partition directory;
    the rewrite is one wide repartition, no skew (round-robin)."""
    import math

    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    size = fs.getContentSummary(jvm_path).getLength()
    n_files = max(1, math.ceil(size / (target_mb * 1024 * 1024)))
    df = spark.read.format(fmt).load(path)
    df.repartition(n_files).write.mode("overwrite").format(fmt).save(out_path)
    return n_files


def write_sorted_by(df: DataFrame, path: str, sort_cols: Sequence[str],
                    n_files: int | None = None, mode: str = "overwrite") -> None:
    """Range-clustered parquet write: ``repartitionByRange`` on the sort
    key + ``sortWithinPartitions`` so every output file covers a disjoint
    key range.  Parquet footers then carry tight min/max stats per file
    and rowgroup, so any reader filtering on the sort key skips whole
    files — the poor man's clustered index, and the single highest-value
    layout choice for an append-mostly event table queried by time.

    Spark's legacy parquet timestamp encoding (INT96) writes NO footer
    statistics — a timestamp sort key would cluster the data and then
    give readers nothing to skip with — so the write pins
    ``outputTimestampType=TIMESTAMP_MICROS`` (stats-bearing, and the
    modern interchange default) for its duration."""
    spark = df.sparkSession
    key = "spark.sql.parquet.outputTimestampType"
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try:
        w = df.repartitionByRange(*([n_files] if n_files else []), *sort_cols) \
              .sortWithinPartitions(*sort_cols)
        w.write.mode(mode).parquet(path)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def morton_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Z-order (Morton) interleave of two non-negative integer columns,
    ``bits`` bits each -> one 2*bits-bit clustering key.

    The multi-column analog of write_sorted_by's single-key range
    clustering: sorting by the interleaved key co-locates rows that are
    close in BOTH dimensions, so parquet min/max footer stats prune
    scans filtered on EITHER column — the standard lakehouse Z-ORDER
    layout.  Pure bit arithmetic (shift/and/or), whole-stage codegen'd,
    and — deliberately — reproducible in ANSI SQL for the oracle gate."""
    from pyspark.sql import functions as F

    a = a.cast("long") % F.lit(1 << bits)
    b = b.cast("long") % F.lit(1 << bits)
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def write_zordered(df: DataFrame, path: str, col_a: str, col_b: str,
                   n_files: int | None = None, bits: int = 16,
                   mode: str = "overwrite") -> None:
    """Physically Z-order a table on two integer dimensions: cluster by
    the Morton interleave of (col_a, col_b), write ``n_files`` range-
    disjoint parquet files, and DROP the synthetic key — what survives
    on disk is the footer min/max stats of the two REAL columns, which
    is all a reader needs to skip files for predicates on either or
    both dimensions (the lakehouse OPTIMIZE ZORDER write path;
    layout_zorder_skipping is the exactly-checkable accounting twin of
    this operator).

    Scale shape: one range shuffle on the z key (sampled range
    boundaries, same cost class as any global sort-write) + an in-
    partition sort; no driver state.  The projection dropping the key
    preserves the range partitioning — no second exchange."""
    zcol = "__tubes_zkey"
    spark = df.sparkSession
    key = "spark.sql.parquet.outputTimestampType"
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try:
        z = df.withColumn(zcol, morton_key(F.col(col_a), F.col(col_b), bits))
        w = (
            z.repartitionByRange(*([n_files] if n_files else []), zcol)
            .sortWithinPartitions(zcol)
            .drop(zcol)
        )
        w.write.mode(mode).parquet(path)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def parquet_file_stats(path: str, cols: Sequence[str]) -> list[dict]:
    """Per-FILE (min, max, rows) footer statistics for ``cols`` of every
    parquet data file under ``path`` — the zone maps a scan planner
    prunes with, read directly from the footers via pyarrow (no Spark
    job).  Returns one dict per file, sorted by file name."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet") or name.startswith("_"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        row: dict = {"file": name, "rows": md.num_rows}
        for c in cols:
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                if st is None or not st.has_min_max:
                    lo, hi = None, None
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            row[f"{c}_min"], row[f"{c}_max"] = lo, hi
        out.append(row)
    return out
