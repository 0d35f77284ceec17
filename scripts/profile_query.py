#!/usr/bin/env python3
"""Per-job profile of one (or more) headline queries — guide §1
("measure first"): run the query exactly as bench.py does (same session
factory, same count() action, warm best-of-N discipline optional) with
the Spark event log enabled, then parse the log into a per-job table:

    job id | wall ms | #stages | #tasks | job group/description | first stage name

so a 10-second "one query" can be decomposed into the 30 driver actions
it actually runs (index writes, localCheckpoints, compactions, metastore
round-trips).  Usage:

    python scripts/profile_query.py ann_kmeans_semantic_dedup [more...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default nproc)."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: profile_query.py <query> [query...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 8)
    evdir = "/tmp/tubes_profile_eventlog"
    import shutil

    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)

    from pyspark.sql import SparkSession

    from tubes_spark.session import get_spark  # noqa: F401  (config parity)

    # same knobs as bench.py's get_spark call, plus the event log
    spark = (
        SparkSession.builder.appName("tubes_profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.eventLog.dir", evdir)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    from tubes_spark.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, t, sf_dir).count()
    spark.range(1000).repartition(cpus).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    marks = []  # (name, t0_ms, t1_ms, wall_s) per timed run
    for name in names:
        fn = queries[name]
        fn(spark, sf_dir).count()  # warm run (codegen etc.), not marked
        spark.sparkContext.setJobDescription(f"PROFILED::{name}")
        t0 = time.time()
        fn(spark, sf_dir).count()
        t1 = time.time()
        spark.sparkContext.setJobDescription(None)
        marks.append((name, t0 * 1000, t1 * 1000, t1 - t0))
    spark.stop()

    # ---- parse the event log (file, or Spark 4 rolling dir) ----
    logs = sorted(Path(evdir).glob("*"), key=lambda p: p.stat().st_mtime)
    target = logs[-1]
    files = (
        sorted(p for p in target.iterdir() if p.name.startswith("events"))
        if target.is_dir()
        else [target]
    )
    events = []
    for fp in files:
        with open(fp) as fh:
            for line in fh:
                try:
                    events.append(json.loads(line))
                except Exception:
                    pass
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    for ev in events:
        k = ev.get("Event")
        if k == "SparkListenerJobStart":
            jid = ev["Job ID"]
            props = ev.get("Properties") or {}
            jobs[jid] = {
                "start": ev["Submission Time"],
                "desc": props.get("spark.job.description", ""),
                "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                "ntasks": sum(
                    s.get("Number of Tasks", 0) for s in ev.get("Stage Infos", [])
                ),
                "names": [s.get("Stage Name", "") for s in ev.get("Stage Infos", [])],
            }
        elif k == "SparkListenerJobEnd":
            if ev["Job ID"] in jobs:
                jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
        elif k == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            stages[si["Stage ID"]] = {
                "name": si.get("Stage Name", ""),
                "ntasks": si.get("Number of Tasks", 0),
            }

    for name, t0, t1, wall in marks:
        print(f"\n=== {name}: {wall:.2f}s wall ===")
        sel = [
            (jid, j)
            for jid, j in sorted(jobs.items())
            if "end" in j and t0 <= j["start"] <= t1
        ]
        tot = 0.0
        for jid, j in sel:
            dur = j["end"] - j["start"]
            tot += dur
            first = (j["names"] or [""])[0]
            desc = j["desc"].replace(f"PROFILED::{name}", "").strip()
            print(
                f"  job {jid:4d} {dur:7.0f}ms  stages={len(j['stages']):2d} "
                f"tasks={j['ntasks']:4d}  {first[:80]}"
            )
        gap = wall * 1000 - tot
        print(
            f"  -- {len(sel)} jobs, {tot:.0f}ms in jobs, "
            f"{gap:.0f}ms driver-side gaps ({100 * gap / (wall * 1000):.0f}%)"
        )


if __name__ == "__main__":
    main()
