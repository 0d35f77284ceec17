#!/usr/bin/env python3
"""Capture `.explain("formatted")` evidence for the r14 optimization
round.  Captured frames (the meaningful pre-pin plans, same discipline
as r13's capture script):

* index_topk_search / index_pq_topk serving frames — the arriving-side
  round-robin spread (RoundRobinPartitioning feeding the probe join)
  is the r14 change; before-plans show the single-split scan running
  the probe folds serially.
* the trigram postings similarity frame — the term repartition count
  goes fixed-64 -> scale-adaptive (cores floor, bytes ceiling).
* the full-outer stream-stream join plan — state partitions 8 -> 4
  (Exchange hashpartitioning count), plus the overlap/schema changes
  that don't show in the plan.
* a representative JVM-state drain plan under state_sized_shuffle —
  default cap 8 -> 4.

Usage:  python capture_plans_r14.py <repo_root> <suffix>
writes  <this repo>/plans/r14/<name>_<suffix>.txt
Run once with <repo_root>=a round-open checkout and suffix=before,
once with the working tree and suffix=after.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

repo = sys.argv[1]
suffix = sys.argv[2]
sys.path.insert(0, repo)
OUT = Path(__file__).resolve().parent.parent / "plans" / "r14"
OUT.mkdir(parents=True, exist_ok=True)

from pyspark.sql import functions as F  # noqa: E402

from tubes_spark.session import get_spark  # noqa: E402

spark = get_spark("plan_capture_r14", cpus=8, shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")

from tubes_spark.catalog import load_table  # noqa: E402
from tubes_spark.operators import similarity  # noqa: E402


sf = "/root/testdata/sf0.1"


def grab(name: str, df) -> None:
    p = OUT / f"{name}_{suffix}.txt"
    s = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    p.write_text(s)
    print("wrote", p)


e = load_table(spark, "embeddings", sf).select("vec_id", "embedding", "label")
stored = e.filter(F.col("vec_id") % 3 != 0)
queries = e.filter(F.col("vec_id") % 3 == 0)

tmp = tempfile.mkdtemp(prefix="plans_r14_")
try:
    # ---- full-vector serving path (index_topk_search / index_filtered_topk)
    idx = f"{tmp}/idx"
    similarity.write_ann_index(stored, idx, n_anchors=8, payload_cols=["label"])
    grab(
        "index_topk_search",
        similarity.index_topk(
            queries.select("vec_id", "embedding"), spark, idx, k=3, n_probe=2
        ),
    )

    # ---- PQ serving path (index_pq_topk)
    pq = f"{tmp}/pq"
    similarity.write_pq_ann_index(
        e.filter(F.col("vec_id") % 3 == 1).select("vec_id", "embedding"),
        pq, n_anchors=8, m=8,
    )
    grab(
        "index_pq_topk",
        similarity.index_topk_pq(
            queries.select("vec_id", "embedding"), spark, pq, k=3, n_probe=2
        ),
    )

    # ---- trigram postings similarity (ngram_cosine_top_pairs cold build)
    import tubes_spark.queries as Qm

    grab("trigram_sim", Qm._build_trigram_tfidf_sim(spark, sf))

    # ---- full-outer stream-stream join (plan captured pre-start; the
    # state partition count pins into Exchange hashpartitioning)
    import os

    from tubes_spark.streaming.run import file_replay_source

    foj_parts = None
    try:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        # mirror the query's pin (8 before r14, 4 after) by reading the
        # query source: run the real query fn up to the join?  Simpler:
        # set the same value the query sets.
        import inspect

        src = inspect.getsource(Qm.streaming_full_outer_join)
        if 'partitions", "8"' in src:
            foj_parts = "8"
        else:
            foj_parts = str(
                int(os.environ.get("TUBES_SPARK_STREAM_PARTS", "0") or 0) or 4
            )
        spark.conf.set("spark.sql.shuffle.partitions", foj_parts)
        ev = load_table(spark, "events", sf)
        v_real = ev.filter(F.col("event_type") == "view").select(
            F.col("event_id").alias("view_id"), "user_id",
            F.col("ts").alias("ts_v"),
        )
        p_real = ev.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("user_id_p"),
            F.col("ts").alias("ts_p"), F.col("value").alias("purchase_value"),
        )
        v_real.write.parquet(f"{tmp}/v")
        p_real.write.parquet(f"{tmp}/p")
        v = file_replay_source(
            spark, f"{tmp}/v", v_real.schema, max_files_per_trigger=1
        ).withWatermark("ts_v", "8 days")
        p = file_replay_source(
            spark, f"{tmp}/p", p_real.schema, max_files_per_trigger=1
        ).withWatermark("ts_p", "8 days")
        j = v.join(
            p,
            (F.col("user_id") == F.col("user_id_p"))
            & (F.col("ts_p") >= F.col("ts_v"))
            & (F.col("ts_p") <= F.col("ts_v") + F.expr("INTERVAL 1 HOUR")),
            "full_outer",
        )
        grab("streaming_full_outer_join", j)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    # ---- representative JVM-state drain under state_sized_shuffle
    from tubes_spark.streaming.run import state_sized_shuffle

    with state_sized_shuffle(spark):
        stream = file_replay_source(
            spark, f"{tmp}/v",
            "view_id long, user_id long, ts_v timestamp",
            max_files_per_trigger=1,
        )
        agg = (
            stream.withWatermark("ts_v", "1 day")
            .groupBy(F.window("ts_v", "1 hour"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        grab("jvm_state_drain_agg", agg)
finally:
    shutil.rmtree(tmp, ignore_errors=True)
