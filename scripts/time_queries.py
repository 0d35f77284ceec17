#!/usr/bin/env python3
"""Best-of-N wall timing for a subset of headline queries, with the
EXACT bench.py session factory and count() action — the measurement
loop used while optimizing (guide §1: measure first, re-measure after
each change).  Usage:

    python scripts/time_queries.py q1 q2 ...        # best-of-3
    RUNS=5 python scripts/time_queries.py q1        # best-of-5

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default nproc), RUNS (default 3).
Prints one line per query: name best [all runs]."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: time_queries.py <query> [query...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 8)
    runs = int(os.environ.get("RUNS", "3"))

    from tubes_spark.session import get_spark

    spark = get_spark("tubes_time", cpus=cpus, shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()

    # same warm-up as bench.py
    from tubes_spark.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, t, sf_dir).count()
    spark.range(1000).repartition(cpus).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    for name in names:
        fn = queries[name]
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            times.append(round(time.perf_counter() - t0, 3))
        print(f"{name}  best={min(times)}  runs={times}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
