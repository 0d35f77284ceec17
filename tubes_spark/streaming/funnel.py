"""Custom stateful streaming operator: conversion-funnel detection.

The reference's ``Pump`` machinery (Tubes/Pump.hs — send/recv against a
comonadic state) maps onto Structured Streaming's keyed state stores;
``applyInPandasWithState`` covers the fold-shaped uses
(streaming/state.py).  This module exercises keyed state on a pattern
that is NOT a fold: for every user, pair each ``purchase`` with the
most recent preceding ``view`` and emit the conversion when the gap is
within the attribution window.  One 16-byte state cell per user (the
last view seen) survives across micro-batches and checkpoint restarts.

Spark 4's arbitrary-state successor (``transformWithStateInPandas``)
would express the same processor with named ValueState; its python
driver worker needs google.protobuf, which this container doesn't ship,
so the operator stands on the GroupState API — semantics identical, and
the state cell is the same theoretical minimum.

Scale shape: state is O(distinct users) x 16 bytes; each batch shuffles
once on user_id (the exchange any keyed stateful op pays); emission is
append-mode — conversions emit exactly once, nothing re-emits.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FUNNEL_OUTPUT_SCHEMA = (
    "user_id long, view_event_id long, purchase_event_id long, lag_sec long"
)


def funnel_conversions_stream(grouped, window_us: int,
                              event_time_col: "str | None" = None,
                              evict_gap_ms: "int | None" = None):
    """Attach the funnel processor to a ``groupBy('user_id')`` of a
    stream with columns (user_id, ts_us, event_id, event_type).

    **Bounded state:** pass ``event_time_col`` (a timestamp column the
    caller watermarked before the groupBy) and ``evict_gap_ms`` to run
    under ``EventTimeTimeout``: a user whose last event is more than
    ``evict_gap_ms`` behind the watermark has their last-view register
    dropped from the state store.  With ``evict_gap_ms * 1000 >=
    window_us`` and in-order delivery the eviction is LOSSLESS — a view
    that far behind the watermark can never pair with any future
    purchase inside the attribution window — so results are identical
    to the NoTimeout run while state stays O(users active within the
    horizon) instead of O(users ever seen).

    In-batch rows for a key arrive unordered: the handler sorts by
    (ts_us, event_id) — the same total order the batch oracle uses —
    walks the sequence updating the last-view register, and emits one
    row per converting purchase.  The register persists as GroupState,
    so a view in batch N converts a purchase in batch N+1.  Correct
    pairing across batches requires the REPLAY to be event-time-ordered
    across triggers (in-order delivery); bounded replays get that from
    time-sliced input files, production deployments from log offsets."""

    evict = event_time_col is not None and evict_gap_ms is not None

    def update(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if evict and state.hasTimedOut:
            # a register this far behind the watermark can never
            # convert again (gap >= attribution window): drop it
            state.remove()
            return
        user_id = int(key[0])
        last_ts, last_id = state.get if state.exists else (None, None)
        out: list[tuple[int, int, int, int]] = []
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts_us", "event_id"])
        for ts_us, eid, etype in zip(
            pdf["ts_us"].astype("int64"),
            pdf["event_id"].astype("int64"),
            pdf["event_type"],
        ):
            if etype == "view":
                last_ts, last_id = int(ts_us), int(eid)
            elif (
                etype == "purchase"
                and last_ts is not None
                and int(ts_us) - last_ts <= window_us
            ):
                out.append(
                    (user_id, last_id, int(eid), (int(ts_us) - last_ts) // 1_000_000)
                )
        if last_ts is not None:
            state.update((last_ts, last_id))
            if evict and len(pdf):
                batch_last_ms = int(pdf[event_time_col].max().value) // 1_000_000
                state.setTimeoutTimestamp(
                    max(batch_last_ms + evict_gap_ms,
                        state.getCurrentWatermarkMs() + 1)
                )
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "view_event_id", "purchase_event_id", "lag_sec"],
            )

    return grouped.applyInPandasWithState(
        update,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType="view_ts_us long, view_event_id long",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if evict
            else GroupStateTimeout.NoTimeout
        ),
    )
