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
``input_fingerprint`` is its incremental form: per-FILE digests cached
by (path, size, mtime), combined through the same commutative sums, so
fingerprinting an unchanged 100 TB input re-reads NO data files — the
driver lists file status (namenode metadata, the same listing the
planner does anyway) and sums cached digests.

Reference parity: the reference has no persistence at all (SURVEY.md
§2.7 — demo I/O only); this is a north-star extension
(SURVEY.md §2.8), sibling to the exactly-once and atomic-group sinks.
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(cols: "list[str]"):
    """Canonical per-row string: ``to_json`` of the sorted-field struct
    with nulls KEPT.  JSON escaping makes the encoding prefix-free —
    a value containing a would-be separator cannot shift column
    boundaries, and SQL NULL (``"c":null``) is distinct from every
    string including ``'null'`` (``"c":"null"``) — closing the ADVICE
    r8 finding against the old unescaped ``concat_ws('\\x1f', ...)``
    canonical (residual risk is the documented ~2^-96 additive-md5
    collision bound)."""
    return F.to_json(
        F.struct(*[F.col(c).alias(c) for c in cols]), {"ignoreNullFields": "false"}
    )


def content_fingerprint(df: DataFrame, cols: "list[str] | None" = None) -> str:
    """Exact, order-independent content digest of ``df``.

    Canonical row string = JSON of the sorted-column struct (see
    ``_canon``); per-row md5 splits into two 48-bit integers summed
    exactly through DECIMAL(38,0) — commutative, so partitioning and
    row order cannot move the digest, and 96 summed bits + the row
    count make silent collisions ~2^-96.  One scan, one tiny
    aggregate; no driver data beyond three numbers."""
    cols = sorted(df.columns) if cols is None else list(cols)
    canon = F.md5(_canon(cols))
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
    return f"{r['n']}-{r['sa'] or 0}-{r['sb'] or 0}"


def _list_data_files(input_path: str) -> "dict[str, tuple[int, int]]":
    """(relpath -> (size, mtime_ns)) for every data file under
    ``input_path`` (a parquet file or directory).  Hidden/underscore
    entries (``_SUCCESS``, ``.crc``) are not data and are skipped.
    This is pure file-status listing — the same namenode metadata the
    query planner fetches — and reads no data bytes."""
    root = Path(input_path)
    if root.is_file():
        st = root.stat()
        return {root.name: (st.st_size, st.st_mtime_ns)}
    out: "dict[str, tuple[int, int]]" = {}
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if not d.startswith((".", "_"))]
        for fn in filenames:
            if fn.startswith((".", "_")):
                continue
            p = Path(dirpath) / fn
            st = p.stat()
            out[str(p.relative_to(root))] = (st.st_size, st.st_mtime_ns)
    return out


def input_fingerprint(
    spark,
    input_path: str,
    cache_file: str,
    cols: "list[str] | None" = None,
) -> str:
    """Incremental :func:`content_fingerprint` over a parquet input.

    Per-file digests ``(n, sa, sb)`` are cached in ``cache_file`` keyed
    by ``(relpath, size, mtime_ns)``; only files whose status changed
    (or are new) are re-scanned — grouped by ``input_file_name()`` in
    ONE Spark job over just those files — and removed files simply drop
    out of the sum.  Because the per-row digest is commutative and
    file-local, the combined sum is bit-identical to
    ``content_fingerprint`` of the whole input, while an unchanged
    input costs a driver-side listing and ZERO Spark jobs (``spark``
    may even be ``None`` then — the structural proof no data is read).

    The cache publishes atomically (tmp + rename) beside the stage it
    serves; a torn write just means re-scanning next run."""
    files = _list_data_files(input_path)
    cache_path = Path(cache_file)
    cached: "dict[str, list]" = {}
    resolved: "list[str] | None" = sorted(cols) if cols else None
    if cache_path.exists():
        try:
            raw = json.loads(cache_path.read_text())
            if raw.get("cols") == (sorted(cols) if cols else None):
                cached = raw.get("files", {})
                resolved = resolved or raw.get("resolved")
        except (ValueError, OSError):
            cached = {}  # torn/corrupt cache -> full re-scan, never wrong
    stale = [
        rel
        for rel, (size, mtime) in files.items()
        if rel not in cached or cached[rel][0] != size or cached[rel][1] != mtime
    ]
    if stale:
        root = Path(input_path).resolve()
        paths = [str(root if root.is_file() else root / rel) for rel in stale]
        schema_cols = sorted(spark.read.parquet(*paths).columns)
        use_cols = sorted(cols) if cols else schema_cols
        if resolved is not None and use_cols != resolved and not cols:
            # schema evolved since the cache was built: cached per-file
            # digests used a different column set and cannot combine
            # with new ones — invalidate and re-scan everything
            cached, resolved = {}, None
            stale = sorted(files)
            paths = [str(root if root.is_file() else root / rel) for rel in stale]
            # ADVICE r9: the column set must come from the FULL path set
            # now being re-scanned, not from the original stale subset —
            # first-footer inference over a subset can miss (or invent)
            # columns relative to content_fingerprint of the whole
            # input, silently breaking the bit-identical equivalence
            use_cols = sorted(spark.read.parquet(*paths).columns)
        resolved = use_cols
        canon = F.md5(_canon(list(use_cols)))
        h1 = F.conv(F.substring(canon, 1, 12), 16, 10).cast("decimal(38,0)")
        h2 = F.conv(F.substring(canon, 13, 12), 16, 10).cast("decimal(38,0)")
        per_file = (
            spark.read.parquet(*paths)
            .select(F.input_file_name().alias("f"), h1.alias("a"), h2.alias("b"))
            .groupBy("f")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("a").alias("sa"),
                F.sum("b").alias("sb"),
            )
            .collect()
        )
        by_rel: "dict[str, tuple[int, int, int]]" = {}
        for r in per_file:
            fp = r["f"]
            fp = fp[len("file:"):] if fp.startswith("file:") else fp
            rel = (
                root.name
                if root.is_file()
                else str(Path(fp).resolve().relative_to(root))
            )
            by_rel[rel] = (r["n"], int(r["sa"] or 0), int(r["sb"] or 0))
        for rel in stale:
            size, mtime = files[rel]
            if rel in by_rel:
                n, sa, sb = by_rel[rel]
            else:
                # absent from the grouped scan: a ZERO-ROW file (no rows
                # to carry input_file_name) — or a path-mapping mismatch
                # between os.walk relpaths and Spark's URI-style
                # input_file_name (percent-encoded specials).  ADVICE r9:
                # never default to a zero digest — the wrong fingerprint
                # would persist via the (size, mtime) cache where even
                # the fp1==fp0 self-check can't see it.  Verify by
                # reading THIS file alone (no path mapping involved): a
                # genuinely empty file keeps (0,0,0); a non-empty one
                # gets its exact per-file digest from the single-path
                # scan.
                p = str(root if root.is_file() else root / rel)
                canon_cols = list(use_cols)
                c1 = F.md5(_canon(canon_cols))
                r = (
                    spark.read.parquet(p)
                    .select(
                        F.conv(F.substring(c1, 1, 12), 16, 10)
                        .cast("decimal(38,0)")
                        .alias("a"),
                        F.conv(F.substring(c1, 13, 12), 16, 10)
                        .cast("decimal(38,0)")
                        .alias("b"),
                    )
                    .agg(
                        F.count(F.lit(1)).alias("n"),
                        F.sum("a").alias("sa"),
                        F.sum("b").alias("sb"),
                    )
                    .first()
                )
                n, sa, sb = r["n"], int(r["sa"] or 0), int(r["sb"] or 0)
            cached[rel] = [size, mtime, n, str(sa), str(sb)]
        cache_path.parent.mkdir(parents=True, exist_ok=True)
        tmp = cache_path.parent / f".tmp-{cache_path.name}-{uuid.uuid4().hex[:8]}"
        tmp.write_text(
            json.dumps(
                {
                    "cols": sorted(cols) if cols else None,
                    "resolved": resolved,
                    "files": cached,
                }
            )
        )
        os.replace(tmp, cache_path)
    n = sum(cached[rel][2] for rel in files)
    sa = sum(int(cached[rel][3]) for rel in files)
    sb = sum(int(cached[rel][4]) for rel in files)
    return f"{n}-{sa}-{sb}"


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
