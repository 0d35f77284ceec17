#!/usr/bin/env python3
"""In-session A/B of tempfile.tempdir (disk /tmp vs tmpfs /dev/shm) for
streaming drains: the replay input dir, checkpoint dir and foreachBatch
epoch sinks all come from tempfile.mkdtemp, so flipping tempfile.tempdir
inside one session isolates checkpoint/commit I/O placement from every
JVM/session variable.  Interleaved runs (ABABAB...) so host drift hits
both arms equally.  Usage: python scripts/ab_tmpdir.py q1 q2 ..."""

from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 8)
    rounds = int(os.environ.get("ROUNDS", "4"))

    from tubes_spark.session import get_spark

    spark = get_spark("tubes_ab", cpus=cpus, shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    from tubes_spark.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, t, sf_dir).count()
    spark.range(1000).repartition(cpus).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    for name in names:
        fn = queries[name]
        fn(spark, sf_dir).count()  # warm
        res: dict[str, list[float]] = {"/tmp": [], "/dev/shm": []}
        for _ in range(rounds):
            for arm in ("/tmp", "/dev/shm"):
                tempfile.tempdir = arm
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                res[arm].append(round(time.perf_counter() - t0, 3))
        tempfile.tempdir = None
        for arm, ts in res.items():
            print(f"{name:40s} {arm:9s} best={min(ts):6.3f} all={ts}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
