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

from pyspark.sql import DataFrame, SparkSession


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


def write_bucketed(df: DataFrame, table: str, bucket_cols: Sequence[str],
                   n_buckets: int, path: str | None = None,
                   sort_cols: Sequence[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Bucketed table write: rows are hash-partitioned into ``n_buckets``
    files per partition on ``bucket_cols`` and registered in the catalog.
    Two tables bucketed the same way join WITHOUT a shuffle — at 100 TB
    this turns the recurring fact-fact join (lineitem x orders on
    orderkey) from the dominant network cost into a local zipper merge.
    ``sort_cols`` additionally pre-sorts within buckets so the join can
    skip its sort.  Bucketing requires the table catalog (``saveAsTable``);
    ``path`` makes it an external table at that location."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucketing metadata (and therefore shuffle-free
    joins) only survives through the catalog, not raw parquet paths."""
    return spark.table(table)
