#!/usr/bin/env python3
"""Capture `.explain("formatted")` evidence for the r13 optimization
round: the operator-level plans the heavy queries execute (the queries
themselves return eagerly-pinned frames whose final explain is just a
checkpoint scan, so the meaningful plan is the screen/assignment/mining
frame BEFORE pinning).

Usage:  python capture_plans_r13.py <repo_root> <suffix>
writes  <this repo>/plans/r13/<name>_<suffix>.txt

Run once with <repo_root>=a HEAD checkout and suffix=before, once with
the working tree and suffix=after.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
from pathlib import Path

repo = sys.argv[1]
suffix = sys.argv[2]
sys.path.insert(0, repo)
OUT = Path(__file__).resolve().parent.parent / "plans" / "r13"
OUT.mkdir(parents=True, exist_ok=True)

from pyspark.sql import functions as F  # noqa: E402

from tubes_spark.session import get_spark  # noqa: E402

spark = get_spark("plan_capture", cpus=8, shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")

from tubes_spark.catalog import load_table  # noqa: E402
from tubes_spark.operators import dedup, similarity  # noqa: E402

sf = "/root/testdata/sf0.1"


def grab(name: str, df) -> None:
    p = OUT / f"{name}_{suffix}.txt"
    s = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    p.write_text(s)
    print("wrote", p)


e = load_table(spark, "embeddings", sf).select("vec_id", "embedding")
slices = [e.filter(F.col("vec_id") % 3 == i) for i in range(3)]

tmp = tempfile.mkdtemp(prefix="plans_ann_")
try:
    similarity.write_ann_index(slices[0], tmp, n_anchors=16)
    anchors = similarity._read_anchors(tmp)
    # cell assignment (expr kernel)
    grab("ann_cell_assignment", similarity._with_cell(slices[1], "embedding", anchors))
    # the incremental screen (no side effects at update_index=False)
    grab(
        "ann_incremental_screen",
        similarity.incremental_ann_new(slices[1], spark, tmp, threshold=0.9),
    )
    grab(
        "ann_nprobe_screen",
        similarity.incremental_ann_new(slices[2], spark, tmp, threshold=0.7, n_probe=2),
    )
finally:
    shutil.rmtree(tmp, ignore_errors=True)

el = load_table(spark, "embeddings", sf).select("vec_id", "embedding", "label")
km = similarity.kmeans_anchors_decimal(el, n_anchors=8, iters=2)
grab("hard_negative_mining", similarity.mine_hard_negatives(el, km))
grab("cluster_balanced_sample", similarity.cluster_prototypes(el, km, m=5))

tmp = tempfile.mkdtemp(prefix="plans_topk_")
try:
    similarity.write_ann_index(
        el.filter(F.col("vec_id") % 3 != 0), tmp, n_anchors=8,
        payload_cols=["label"],
    )
    grab(
        "index_topk_search",
        similarity.index_topk(
            el.filter(F.col("vec_id") % 3 == 0), spark, tmp, k=3, n_probe=2
        ),
    )
finally:
    shutil.rmtree(tmp, ignore_errors=True)

d = load_table(spark, "documents", sf).select("doc_id", "text", "source", "n_chars")
dslices = [d.filter(F.col("doc_id") % 3 == i) for i in range(3)]
tmp = tempfile.mkdtemp(prefix="plans_mh_")
try:
    dedup.write_minhash_index(dslices[0], tmp, epoch=0)
    grab(
        "dedup_incremental_screen",
        dedup.incremental_minhash_new(dslices[1], spark, tmp),
    )
finally:
    shutil.rmtree(tmp, ignore_errors=True)

spark.stop()
