"""Streaming runners: sources, multi-sink foreachBatch, replay.

* ``prompt`` (Tubes.hs:182-189, line-by-line stdin source)  ->
  :func:`socket_source` / :func:`rate_source` / file stream.
* ``display`` (Tubes.hs:193-196) -> console sink.
* ``runTube`` streaming half (Tubes/Core.hs:255-262) ->
  :func:`run_stream` with ``Trigger.AvailableNow`` for bounded drains.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from tubes_spark.sink import Sink


def rate_source(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def socket_source(spark: SparkSession, host: str = "localhost", port: int = 9999) -> DataFrame:
    """``prompt`` analog: line stream from a socket."""
    return spark.readStream.format("socket").option("host", host).option("port", port).load()


def file_replay_source(spark: SparkSession, path: str, schema, fmt: str = "parquet",
                       max_files_per_trigger: int = 1) -> DataFrame:
    """Replay a directory of files as a stream (bounded drain with
    AvailableNow) — how the events table is replayed in tests/bench."""
    return (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(path)
    )


def run_stream(
    df: DataFrame,
    sink: Sink,
    checkpoint: str,
    available_now: bool = True,
    query_name: str = "tubes_stream",
):
    """Start a streaming query that drives the whole sink tree once per
    micro-batch (the canonical multi-sink pattern; at-least-once per
    sink, not atomic across sinks — SURVEY.md §7.4)."""
    w = (
        df.writeStream.queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .foreachBatch(sink.for_each_batch())
        .outputMode("update")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def drain_to_df(df: DataFrame, name: str, output_mode: str = "complete",
                timeout_s: int = 600) -> DataFrame:
    """Run a bounded streaming plan to completion (AvailableNow) into a
    memory sink and return the final result table — the bridge that lets
    streaming plans face the same oracle gate as batch ones.  Memory
    sink rows live on the driver: only use for aggregated (small)
    results."""
    q = (
        df.writeStream.queryName(name)
        .format("memory")
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return df.sparkSession.table(name)
