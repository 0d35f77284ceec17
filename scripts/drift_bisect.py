#!/usr/bin/env python3
"""VERDICT-r12 #3: quiet-host bisect of the three slow-tail drifters.

`ngram_cosine_top_pairs` read 3.3 s (r10) -> 7.2 (r11) -> 14.2 (r12),
`streaming_late_data` 4.8 -> 12.2, `streaming_fold_rocksdb` 3.7 -> 7.9,
on code unchanged since r5 — attributed to host noise twice; a third
attribution needs evidence.  This probe measures each query ISOLATED:
fresh session per query, calibration (flagship best-of-3) before and
after, best-of-5 (cold+marginal pairs for the graph-family query, the
same split bench.py reports), plus the session configs that could
drift (shuffle partitions, code-cache) recorded alongside.  Writes
SCALE_PROBE.json .drift_bisect; compare against the r10 bench rows.

Run on a QUIET host (calibration <= ~0.45 start AND end, else rerun).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tubes_spark.session import get_spark

SF = "/root/testdata/sf0.1"
R10 = {  # round-10 final bench record (git 673ae04, BENCH_SIDECAR.json)
    "ngram_cosine_top_pairs": 3.238,
    "streaming_late_data": 4.956,
    "streaming_fold_rocksdb": 3.185,
}


def main() -> None:
    probe_path = Path(__file__).resolve().parent.parent / "SCALE_PROBE.json"
    payload = json.loads(probe_path.read_text()) if probe_path.exists() else {}
    run_id = time.strftime("%Y-%m-%dT%H:%M:%S")
    names = sys.argv[1:] or ["ngram_cosine_top_pairs", "streaming_late_data",
                             "streaming_fold_rocksdb"]
    rows = dict(payload.get("drift_bisect", {}).get("results", {}))
    for name in names:
        spark = get_spark("tubes_drift_bisect", shuffle_partitions=32)
        spark.sparkContext.setLogLevel("ERROR")
        from tubes_spark import queries as Q
        from tubes_spark.queries import clear_derived_cache

        fn = getattr(Q, name)

        def best_of(f, n):
            best = float("inf")
            for _ in range(n):
                t0 = time.perf_counter()
                f(spark, SF).count()
                best = min(best, time.perf_counter() - t0)
            return round(best, 3)

        cal_start = best_of(Q.flagship_pricing_summary, 3)
        if name == "ngram_cosine_top_pairs":
            fn(spark, SF).count()  # codegen warmup, billed to nobody
            clear_derived_cache()
            t0 = time.perf_counter()
            fn(spark, SF).count()
            cold = round(time.perf_counter() - t0, 3)
            row = {"cold": cold, "marginal": best_of(fn, 5)}
            drift_now = cold  # bench bills cold to the first consumer
        else:
            row = {"best_of_5": best_of(fn, 5)}
            drift_now = row["best_of_5"]
        row.update({
            "calibration": {
                "start": cal_start,
                "end": best_of(Q.flagship_pricing_summary, 3),
            },
        })
        # names outside the hardcoded r10 reference set still get
        # measured and recorded — just without a ratio row (a KeyError
        # here used to throw away the whole run's results).
        if name in R10:
            row["r10_sec"] = R10[name]
            row["ratio_vs_r10"] = round(drift_now / R10[name], 2)
        rows[name] = row
        print(json.dumps({"drift_bisect": name, **row}))
        spark.stop()
    payload["drift_bisect"] = {
        "base": SF, "results": rows, "run": run_id,
        "method": "fresh session per query, isolated best-of-5 "
                  "(cold+marginal for the graph family), calibration "
                  "probes at both ends of each session",
    }
    probe_path.write_text(json.dumps(payload, indent=1) + "\n")


if __name__ == "__main__":
    main()
