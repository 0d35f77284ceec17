"""Stage memoization — content-fingerprinted materialization of
expensive pipeline stages.

The 100 TB problem this solves: iterating on a curation pipeline means
re-running it, and the expensive early stages (global dedup, quality
gates) rarely change between iterations.  ``memo_stage`` materializes a
stage to parquet keyed by a caller-supplied fingerprint (typically the
hash of the stage's config + the content fingerprint of its input); a
rerun whose fingerprint matches reads the materialized output and never
builds the stage's plan at all.  Same publish discipline as the atomic
sink group (`sink.py::atomic_parquet_group`): data directories write
first under a unique name, the ``_FINGERPRINT`` marker renames last, so
a crash mid-write leaves only an invisible orphan directory and the
next run recomputes cleanly.  On a real cluster the marker rename maps
to an HDFS rename / S3 conditional put.

``content_fingerprint`` is the distributed input-hash half: an
order-independent exact digest (row count + two 48-bit-per-row md5
halves summed through DECIMAL(38,0)) — a 1000-executor scan fingerprints
identically under any partitioning, and any single-row change moves it.

Reference parity: the reference has no persistence at all (SURVEY.md
§2.7 — demo I/O only); this is a north-star extension
(SURVEY.md §2.8), sibling to the exactly-once and atomic-group sinks.
"""

from __future__ import annotations

import os
import uuid
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_fingerprint(df: DataFrame, cols: "list[str] | None" = None) -> str:
    """Exact, order-independent content digest of ``df``.

    Canonical row string = unit-separator join of all columns as
    strings (NULL gets its own sentinel so ``NULL`` != ``'null'``);
    per-row md5 splits into two 48-bit integers summed exactly through
    DECIMAL(38,0) — commutative, so partitioning and row order cannot
    move the digest, and 96 summed bits + the row count make silent
    collisions ~2^-96.  One scan, one tiny aggregate; no driver data
    beyond three numbers."""
    cols = sorted(df.columns) if cols is None else list(cols)
    canon = F.md5(
        F.concat_ws(
            "\x1f",
            *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols],
        )
    )
    h1 = F.conv(F.substring(canon, 1, 12), 16, 10).cast("decimal(38,0)")
    h2 = F.conv(F.substring(canon, 13, 12), 16, 10).cast("decimal(38,0)")
    r = (
        df.select(h1.alias("a"), h2.alias("b"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("a").alias("sa"),
            F.sum("b").alias("sb"),
        )
        .first()
    )
    return f"{r['n']}-{r['sa']}-{r['sb']}"


def memo_stage(
    spark,
    compute: Callable[[], DataFrame],
    stage_dir: str,
    fingerprint: str,
) -> "tuple[DataFrame, bool]":
    """Materialize ``compute()`` under ``stage_dir`` once per
    ``fingerprint``; return ``(stage_output, reused)``.

    ``compute`` is a thunk so the reuse path never constructs the
    stage's plan (on a shared driver that alone can be seconds of
    analysis time for a wide DAG).  The returned DataFrame always reads
    the materialized parquet — both paths see byte-identical storage,
    so downstream work is plan-identical whether the stage ran or not.

    A fingerprint CHANGE publishes a fresh data directory and atomically
    repoints the marker; the previous directory becomes unreferenced
    (kept for readers mid-flight; reap with any retention sweep)."""
    d = Path(stage_dir)
    marker = d / "_FINGERPRINT"
    if marker.exists():
        pub = marker.read_text().split("\n")
        if len(pub) >= 2 and pub[0] == fingerprint:
            return spark.read.parquet(str(d / pub[1])), True
    data = f"data-{uuid.uuid4().hex[:8]}"
    compute().write.mode("overwrite").parquet(str(d / data))
    tmp = d / f".tmp-{data}"
    tmp.write_text(f"{fingerprint}\n{data}")
    os.replace(tmp, marker)  # the atomic publish point
    return spark.read.parquet(str(d / data)), False
