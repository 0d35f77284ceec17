#!/usr/bin/env python3
"""Streaming-drain tuning probe (round-4 BASELINE.md evidence).

Replays the events table as a bounded file stream through the hourly
windowed agg and prints ev/s for a matrix of (maxFilesPerTrigger,
shuffle partitions) — the data behind bench.py's mfpt=8/parts=4 choice:
commit overhead is fixed per trigger and per state partition, so fewer
triggers x state-sized partitions wins at any scale.

    python scripts/bench_streaming.py        # sf0.1 by default
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from tubes_spark.catalog import load_table
from tubes_spark.session import get_spark
from tubes_spark.streaming.run import file_replay_source


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench_stream_probe", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="probe_stream_")
    try:
        events = load_table(spark, "events", sf_dir)
        n = events.count()
        events.repartition(8).write.parquet(f"{tmp}/in")

        def drain(ck: str, mfpt: int, parts: int) -> float:
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            stream = file_replay_source(
                spark, f"{tmp}/in", events.schema, max_files_per_trigger=mfpt
            )
            agg = (
                stream.withWatermark("ts", "40 days")
                .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
                .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
            )
            t0 = time.perf_counter()
            q = (
                agg.writeStream.format("noop")
                .outputMode("update")
                .option("checkpointLocation", f"{tmp}/{ck}")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(600)
            return time.perf_counter() - t0

        drain("warm", 4, 8)
        for mfpt, parts in [(4, 8), (8, 8), (8, 4), (8, 2), (8, 1)]:
            best = min(
                drain(f"ck_{mfpt}_{parts}_a", mfpt, parts),
                drain(f"ck_{mfpt}_{parts}_b", mfpt, parts),
            )
            print(f"mfpt={mfpt} parts={parts}: {best:.3f}s -> {n / best:.0f} ev/s")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
