"""Mergeable approximate heavy hitters — SpaceSaving (Metwally et al.,
ICDT 2005) as a two-phase Spark aggregation.

Exact top-k (``top_bigrams_global``) holds far past 100 TB for n-gram
key spaces, but a truly unbounded key domain (URLs, user ids, raw
substrings) can make even the two-level agg's keyspace too large.  The
classic fix: each task keeps a CAPACITY-bounded SpaceSaving summary
(overflow evicts the min counter, the newcomer inherits its count as
overcount error), then summaries merge by per-key addition — the
mergeable-summaries pattern (Agarwal et al., PODS 2012).

Error contract surfaced per key: ``true <= est_count`` when the key was
tracked everywhere it appeared, and ``est_count <= true +
max_overcount``.  When every task sees at most ``capacity`` distinct
keys the summary degenerates to an exact count (err 0) — the
exactness condition the oracle-gated query relies on; the unit test
exercises REAL eviction with a tiny capacity and checks the bounds.

Scale shape: one Arrow-batched scan producing at most ``capacity`` rows
PER TASK, one narrow shuffle on the key for the merge, then
TakeOrderedAndProject for the top-k.  Driver receives k rows.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def space_saving_topk(
    df: DataFrame,
    key_col: str,
    k: int = 20,
    capacity: int = 4096,
) -> DataFrame:
    """Approximate top-k keys by frequency with per-key error bounds.

    Returns (key_col, est_count, max_overcount) for the k largest
    estimates, ties broken on the key string for engine portability."""

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, tuple[int, int]] = {}
        for pdf in batches:
            for x in pdf[key_col]:
                # output schema declares the key as string; a non-str
                # key (e.g. int64) would otherwise never match across
                # merge phases — coerce before any counter lookup
                if not isinstance(x, str):
                    x = str(x)
                hit = counters.get(x)
                if hit is not None:
                    counters[x] = (hit[0] + 1, hit[1])
                elif len(counters) < capacity:
                    counters[x] = (1, 0)
                else:
                    victim = min(counters.items(), key=lambda it: (it[1][0], it[0]))
                    vcount = victim[1][0]
                    del counters[victim[0]]
                    # newcomer inherits the evicted min count as its
                    # overcount bound — the SpaceSaving invariant
                    counters[x] = (vcount + 1, vcount)
        if counters:
            yield pd.DataFrame(
                [(kk, c, e) for kk, (c, e) in counters.items()],
                columns=[key_col, "est", "err"],
            )

    summaries = df.select(key_col).mapInPandas(
        partial, schema=f"{key_col} string, est long, err long"
    )
    merged = summaries.groupBy(key_col).agg(
        F.sum("est").alias("est_count"),
        F.sum("err").alias("max_overcount"),
    )
    return (
        merged.orderBy(F.col("est_count").desc(), F.col(key_col).asc())
        .limit(k)
    )


def space_saving_stream(df, tok_col: str, bucket_col: str, capacity: int = 64):
    """STREAMING SpaceSaving: per-bucket capacity-bounded heavy-hitter
    summaries maintained in the keyed state store across micro-batches
    — approximate top-k over an UNBOUNDED token domain with state
    bounded BY CONSTRUCTION (<= buckets x capacity counters, so unlike
    ``running_fold`` no watermark eviction is needed; the sketch IS the
    eviction policy).

    Each trigger folds the batch's tokens into the bucket's counter
    map (same replace-min/inherit-count invariant as the batch
    :func:`space_saving_topk`) and re-emits the bucket's FULL summary
    in update mode, tagged with the running ``n_seen`` so a consumer
    takes the max-n_seen rows per bucket as the final summary.  The
    SpaceSaving guarantees hold per bucket at every point in the
    stream: any key with true count > n_seen/capacity is present, and
    ``true <= est <= true + err`` for tracked keys — arrival-order
    affects est values but never those bounds, which is what the
    oracle-gated query checks row-wise.

    State serialization: one JSON string per bucket (<= capacity
    entries) — O(KB), checkpoint-restartable like every keyed op."""
    import json as _json

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        bucket = int(key[0])
        if state.exists:
            js, n_seen = state.get
            counters = {k: tuple(v) for k, v in _json.loads(js).items()}
        else:
            counters, n_seen = {}, 0
        for pdf in pdfs:
            n_seen += len(pdf)
            for x in pdf[tok_col]:
                # counters round-trip through JSON whose keys are
                # always strings — a non-str token would rehydrate as
                # str next trigger and never match, double-counting and
                # breaking the est<=true+err bound; coerce up front
                if not isinstance(x, str):
                    x = str(x)
                hit = counters.get(x)
                if hit is not None:
                    counters[x] = (hit[0] + 1, hit[1])
                elif len(counters) < capacity:
                    counters[x] = (1, 0)
                else:
                    victim = min(counters.items(), key=lambda it: (it[1][0], it[0]))
                    vcount = victim[1][0]
                    del counters[victim[0]]
                    counters[x] = (vcount + 1, vcount)
        state.update((_json.dumps({k: list(v) for k, v in counters.items()}), n_seen))
        if counters:
            yield pd.DataFrame(
                [(bucket, kk, c, e, n_seen) for kk, (c, e) in counters.items()],
                columns=["bucket", "tok", "est", "err", "n_seen"],
            )

    return df.groupBy(bucket_col).applyInPandasWithState(
        update,
        outputStructType="bucket int, tok string, est long, err long, n_seen long",
        stateStructType="js string, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
