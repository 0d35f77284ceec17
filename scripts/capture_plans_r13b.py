#!/usr/bin/env python3
"""Plan evidence for the session-2 r13 optimizations (companion to
capture_plans_r13.py): the PageRank ranks frame before/after the
checkpoint-cadence change.  `before` reconstructs the every-iteration
localCheckpoint loop inline (the pre-change code shape); `after` is the
live query.  Writes plans/r13/doc_centrality_pagerank_{before,after}.txt.
"""

from __future__ import annotations

import sys
from pathlib import Path

repo = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, repo)
OUT = Path(repo) / "plans" / "r13"
OUT.mkdir(parents=True, exist_ok=True)

from pyspark.sql import functions as F  # noqa: E402

from tubes_spark.session import get_spark  # noqa: E402

spark = get_spark("plan_capture_b", cpus=8, shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entrymod  # noqa: E402

from tubes_spark.queries import _trigram_tfidf_sim  # noqa: E402

sf = "/root/testdata/sf0.1"


def grab(name: str, df) -> None:
    p = OUT / f"{name}.txt"
    s = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    p.write_text(s)
    print("wrote", p)


def pagerank_before():
    """The pre-change loop: localCheckpoint EVERY iteration."""
    sim = _trigram_tfidf_sim(spark, sf).filter(F.col("cosine") >= 0.05)
    edges = (
        sim.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            sim.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n_nodes = deg.count()
    damping = 0.85
    base = (1.0 - damping) / n_nodes
    ranks = deg.select("src", "deg", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(6):
        contrib = (
            edges.join(ranks, "src")
            .select(
                F.col("dst"),
                F.round(F.col("rank") / F.col("deg"), 12)
                .cast("decimal(27,12)")
                .alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").cast("double").alias("inflow"))
        )
        ranks = (
            deg.join(contrib, deg["src"] == contrib["dst"], "left")
            .select(
                "src",
                "deg",
                (F.lit(base) + F.lit(damping)
                 * F.coalesce(F.col("inflow"), F.lit(0.0))).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        F.col("src").alias("doc_id"), "deg", F.round(F.col("rank"), 9).alias("rank")
    )


grab("doc_centrality_pagerank_before", pagerank_before())
queries = entrymod.queries()
grab("doc_centrality_pagerank_after", queries["doc_centrality_pagerank"](spark, sf))
spark.stop()
