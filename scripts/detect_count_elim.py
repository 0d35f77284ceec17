#!/usr/bin/env python3
"""Re-derive bench.COUNT_ELIMINATED: queries whose optimized plan loses
joins under a bare ``.count()`` (Catalyst eliminates a left join whose
right side is a per-key aggregate with provably-distinct keys once no
column of it is referenced — so a count() times LESS work than
producing the result).

Run at sf0.001 (plan comparison only needs the plan, but query fns
with eager internals — localCheckpoint, index appends — execute, so
keep the SF tiny).  Prints the affected names with join counts; update
bench.COUNT_ELIMINATED when the battery changes.

Caught in r13 via REST stage metrics: the ANN screen probe read
0.02 MB of a 33 MB index under count().  The gated correctness runs
were never affected (the driver compares full toPandas results).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tubes_spark.session import get_spark


def main() -> None:
    spark = get_spark("count_elim_scan", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    import bench
    from tubes_spark import queries as Q

    sf = "/root/testdata/sf0.001"

    def njoin(df):
        p = df._jdf.queryExecution().optimizedPlan().toString()
        return len(re.findall(r"\bJoin\b", p))

    affected = []
    for name in bench.HEADLINE:
        if name.startswith("streaming_"):
            continue  # drains write real sinks; count() is not the action
        fn = getattr(Q, name)
        try:
            df = fn(spark, sf)
            full, counted = njoin(df), njoin(df.groupBy().count())
        except Exception as ex:  # surface, don't hide
            print(f"ERR {name}: {type(ex).__name__}: {ex}")
            continue
        if counted < full:
            affected.append((name, full, counted))
    for name, full, counted in sorted(affected):
        print(f"{name}: joins {full} -> {counted} under count()")
    missing = sorted(set(n for n, _, _ in affected) - set(bench.COUNT_ELIMINATED))
    stale = sorted(set(bench.COUNT_ELIMINATED) - set(n for n, _, _ in affected))
    print(f"bench.COUNT_ELIMINATED missing: {missing}")
    print(f"bench.COUNT_ELIMINATED stale: {stale}")
    spark.stop()


if __name__ == "__main__":
    main()
