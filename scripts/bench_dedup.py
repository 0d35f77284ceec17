#!/usr/bin/env python3
"""Best-of-N re-measurement for the dedup bench regression (VERDICT r2 #1).

Runs dedup_exact_docs / dedup_minhash_survivors / dedup_simhash_survivors
N times each at sf0.1 and prints per-run + best/median timings, so host
noise can be separated from a real plan regression.
"""
from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tubes_spark.session import get_spark

QUERIES = ["dedup_exact_docs", "dedup_minhash_survivors", "dedup_simhash_survivors"]
N = int(sys.argv[1]) if len(sys.argv) > 1 else 5
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("dedup_bench", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    from tubes_spark.catalog import load_table

    load_table(spark, "documents", SF_DIR).count()
    spark.range(1000).repartition(32).mapInPandas(lambda it: it, schema="id long").count()

    out = {}
    for name in QUERIES:
        runs = []
        for _ in range(N):
            t0 = time.perf_counter()
            queries[name](spark, SF_DIR).count()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "runs": runs,
            "best": min(runs),
            "median": round(statistics.median(runs), 3),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": out}))
    spark.stop()


if __name__ == "__main__":
    main()
