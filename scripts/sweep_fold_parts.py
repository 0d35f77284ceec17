#!/usr/bin/env python3
"""Partition sweep for the Python-keyed-state drains (guide §2.2/§5):
re-measure streaming_fold_evicted / streaming_ttl_sessions shapes at
several state-partition counts.  The r13 chunk-2 sweep that pinned 16
was taken while the checkpoint-checksum thread leak inflated
per-partition commit cost; this re-runs the sweep against HEAD.
Usage: python scripts/sweep_fold_parts.py fold|ttl [parts...]"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
import uuid
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from tubes_spark.session import get_spark


def main() -> None:
    which = sys.argv[1]
    parts_list = [int(p) for p in sys.argv[2:]] or [4, 8, 16, 24]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 8)
    spark = get_spark("tubes_sweep", cpus=cpus, shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    from tubes_spark.catalog import load_table
    from tubes_spark.streaming.run import drain_to_df, write_ordered_slices
    from tubes_spark.streaming.state import running_fold, ttl_session_fold

    e = load_table(spark, "events", sf_dir)

    def run_fold(nparts: int) -> float:
        GAP_MS = 172_800_000
        DAY_US = 86_400_000_000
        base = e.filter(F.col("user_id") % 5 == 1).select(
            (F.col("user_id") * 100000
             + F.expr(f"unix_micros(ts) DIV {DAY_US}")).alias("k"),
            F.unix_micros(F.col("ts")).alias("ts_us"),
            F.floor(F.col("value") * 1_000_000).cast("double").alias("vu"),
        )
        tmp = tempfile.mkdtemp(prefix="tubes_sweep_fold_")
        try:
            mn, mx = base.agg(F.min("ts_us"), F.max("ts_us")).first()
            span = max(int(mx) - int(mn) + 1, 1)
            conds = [
                F.floor((F.col("ts_us") - F.lit(int(mn))) * 4 / F.lit(span)) == i
                for i in range(4)
            ]
            write_ordered_slices(base, conds, f"{tmp}/in")
            t0 = time.perf_counter()
            stream = (
                spark.readStream.schema("k long, ts_us long, vu double")
                .option("maxFilesPerTrigger", "1")
                .parquet(f"{tmp}/in")
                .withColumn("ts", F.timestamp_micros("ts_us"))
                .withWatermark("ts", "10 seconds")
            )
            folded = running_fold(
                stream, ["k"], "vu", op="sum",
                event_time_col="ts", evict_gap_ms=GAP_MS,
            )
            out = drain_to_df(
                folded, f"sw_{uuid.uuid4().hex[:8]}", output_mode="update",
                shuffle_partitions=nparts,
            )
            out.count()
            return time.perf_counter() - t0
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def run_ttl(nparts: int) -> float:
        TTL_US = 30_000 * 1_000_000
        base = e.filter(F.col("user_id") % 5 == 0).select(
            "user_id",
            F.unix_micros(F.col("ts")).alias("ts_us"),
            F.floor(F.col("value") * 1_000_000).alias("vu"),
        )
        tmp = tempfile.mkdtemp(prefix="tubes_sweep_ttl_")
        try:
            mn, mx = base.agg(F.min("ts_us"), F.max("ts_us")).first()
            span = max(int(mx) - int(mn) + 1, 1)
            conds = [
                F.floor((F.col("ts_us") - F.lit(int(mn))) * 4 / F.lit(span)) == i
                for i in range(4)
            ]
            write_ordered_slices(base, conds, f"{tmp}/in")
            t0 = time.perf_counter()
            stream = (
                spark.readStream.schema("user_id long, ts_us long, vu long")
                .option("maxFilesPerTrigger", "1")
                .parquet(f"{tmp}/in")
                .withColumn("ts", F.timestamp_micros("ts_us"))
                .withWatermark("ts", "10 seconds")
            )
            sess = ttl_session_fold(
                stream, "user_id", "ts_us", "vu",
                ttl_us=TTL_US, event_time_col="ts", delay_ms=10_000,
            )
            out = drain_to_df(
                sess, f"sw_{uuid.uuid4().hex[:8]}", output_mode="append",
                shuffle_partitions=nparts,
            )
            out.count()
            return time.perf_counter() - t0
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    run = run_fold if which == "fold" else run_ttl
    run(parts_list[0])  # warm
    for nparts in parts_list:
        times = [round(run(nparts), 3) for _ in range(3)]
        print(f"{which} parts={nparts:3d} best={min(times):6.3f} all={times}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
