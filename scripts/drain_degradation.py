#!/usr/bin/env python3
"""Bisect the within-session slowdown of repeated streaming drains.

Runs one streaming query N times in a single session and prints, per
run: wall seconds, JVM live thread count, and loaded state-store
provider count.  With MODE=stop, calls StateStore.stop() (unload all
providers + stop the maintenance thread) between runs — if the
degradation disappears, accumulated providers/maintenance are the
cause.  Usage: MODE=plain|stop N=8 python scripts/drain_degradation.py
streaming_fold_evicted"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    name = sys.argv[1]
    mode = os.environ.get("MODE", "plain")
    n = int(os.environ.get("N", "8"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 8)

    from tubes_spark.session import get_spark

    spark = get_spark("tubes_degrade", cpus=cpus, shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    from tubes_spark.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, t, sf_dir).count()
    jvm = spark.sparkContext._jvm

    def jvm_threads() -> int:
        return jvm.java.lang.Thread.activeCount()

    def providers() -> str:
        try:
            ss = getattr(
                getattr(
                    jvm.org.apache.spark.sql.execution.streaming.state,
                    "StateStore$",
                ),
                "MODULE$",
            )
            # loadedProviders is a private mutable HashMap; size via reflection
            f = ss.getClass().getDeclaredField(
                "org$apache$spark$sql$execution$streaming$state$StateStore$$loadedProviders"
            )
            f.setAccessible(True)
            return str(f.get(ss).size())
        except Exception as ex:
            return f"?{type(ex).__name__}"

    fn = queries[name]
    for i in range(n):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        print(
            f"run {i}: {wall:7.3f}s threads={jvm_threads()} providers={providers()}",
            flush=True,
        )
        if mode == "stop" and not spark.streams.active:
            getattr(
                getattr(
                    jvm.org.apache.spark.sql.execution.streaming.state,
                    "StateStore$",
                ),
                "MODULE$",
            ).stop()
    spark.stop()


if __name__ == "__main__":
    main()
