"""Round-7 additions: watermark-driven keyed-state eviction
(VERDICT-r6 next-round #1).

The reference pump is bounded and single-threaded, so it never needs
eviction; a continuous Spark deployment does — ``NoTimeout`` keyed
state grows with every key ever seen.  These tests prove the
``EventTimeTimeout`` paths added to ``running_fold`` and the funnel:

* timed-out keys actually LEAVE the state store (asserted through the
  engine's own ``stateOperators.numRowsTotal`` across triggers, not
  through our code's bookkeeping);
* results for non-evicted keys are identical to the NoTimeout run.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tubes_spark.streaming.run import write_ordered_slices


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="tubes_r7_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


MIN_US = 60 * 1_000_000
# the engine's initial watermark is epoch 0 and its late-row filter
# drops rows at/below it — keep test event times at a realistic epoch
BASE_US = 1_700_000_000 * 1_000_000


def _state_rows_per_batch(q):
    """numRowsTotal of the single stateful operator, one entry per
    completed micro-batch (engine-reported, in batch order)."""
    out = []
    for p in q.recentProgress:
        ops = p.get("stateOperators") or []
        if ops:
            out.append(int(ops[0]["numRowsTotal"]))
    return out


def test_running_fold_event_time_eviction(spark, tmpdir):
    """u1 goes quiet after trigger 0; u2 keeps advancing the watermark.
    With a 60 s eviction gap, u1's state cell must be flushed (its
    final row re-emitted) and removed, dropping numRowsTotal 2 -> 1,
    while u2's final accumulator matches the NoTimeout run."""
    from tubes_spark.streaming.state import running_fold

    schema = "user_id long, ts_us long, value double"
    rows = [
        (1, BASE_US + 0 * MIN_US, 1.0),
        (2, BASE_US + 0 * MIN_US, 10.0),
        (2, BASE_US + 10 * MIN_US, 10.0),
        (2, BASE_US + 20 * MIN_US, 10.0),
        (2, BASE_US + 30 * MIN_US, 10.0),
    ]
    df = spark.createDataFrame(rows, schema)
    conds = [
        F.col("ts_us") < BASE_US + 5 * MIN_US,
        F.col("ts_us").between(BASE_US + 5 * MIN_US, BASE_US + 15 * MIN_US),
        F.col("ts_us").between(BASE_US + 15 * MIN_US + 1, BASE_US + 25 * MIN_US),
        F.col("ts_us") > BASE_US + 25 * MIN_US,
    ]
    write_ordered_slices(df, conds, f"{tmpdir}/in")

    def run(evict: bool):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{tmpdir}/in")
            .withColumn("ts", F.timestamp_micros("ts_us"))
            .withWatermark("ts", "10 seconds")
        )
        folded = running_fold(
            stream,
            ["user_id"],
            "value",
            event_time_col="ts" if evict else None,
            evict_gap_ms=60_000 if evict else None,
        )
        seen: list = []
        q = (
            folded.writeStream.foreachBatch(
                lambda bdf, _bid: seen.extend(bdf.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", f"{tmpdir}/ck_{evict}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        final = {}
        for r in seen:
            k = int(r["key"])
            if k not in final or r["n"] >= final[k][1]:
                final[k] = (round(r["acc"], 6), int(r["n"]))
        return final, _state_rows_per_batch(q)

    base, base_state = run(evict=False)
    got, state_rows = run(evict=True)

    # (b) final accumulators identical — including the evicted key's
    # flush row, which re-emits its last (acc, n)
    assert got == base == {1: (1.0, 1), 2: (40.0, 4)}
    # (a) the state store itself shrinks: both keys present early, u1
    # evicted once the watermark clears its last event + 60 s
    assert max(state_rows) == 2
    assert state_rows[-1] == 1
    # NoTimeout keeps every key forever — the contrast the fix is about
    assert base_state[-1] == 2


def test_funnel_event_time_eviction_lossless(spark, tmpdir):
    """Funnel with eviction gap == attribution window: conversions are
    identical to the NoTimeout run (a register that far behind the
    watermark can never convert), and the quiet user's register leaves
    the state store."""
    from tubes_spark.streaming.funnel import funnel_conversions_stream

    schema = "user_id long, ts_us long, event_id long, event_type string"
    rows = [
        # u1 converts in trigger 0, then goes silent forever
        (1, BASE_US + 1 * MIN_US, 10, "view"),
        (1, BASE_US + 5 * MIN_US, 11, "purchase"),
        # u2 stays active across all triggers and keeps converting
        (2, BASE_US + 2 * MIN_US, 12, "view"),
        (2, BASE_US + 70 * MIN_US, 20, "view"),
        (2, BASE_US + 80 * MIN_US, 21, "purchase"),
        (2, BASE_US + 150 * MIN_US, 30, "view"),
        (2, BASE_US + 160 * MIN_US, 31, "purchase"),
        (2, BASE_US + 240 * MIN_US, 40, "view"),
    ]
    df = spark.createDataFrame(rows, schema)
    conds = [
        F.col("ts_us") < BASE_US + 60 * MIN_US,
        F.col("ts_us").between(BASE_US + 60 * MIN_US, BASE_US + 140 * MIN_US),
        F.col("ts_us").between(BASE_US + 140 * MIN_US + 1, BASE_US + 200 * MIN_US),
        F.col("ts_us") > BASE_US + 200 * MIN_US,
    ]
    write_ordered_slices(df, conds, f"{tmpdir}/in")
    window_us = 30 * MIN_US

    def run(evict: bool):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{tmpdir}/in")
            .withColumn("ts", F.timestamp_micros("ts_us"))
            .withWatermark("ts", "10 seconds")
        )
        conv = funnel_conversions_stream(
            stream.groupBy("user_id"),
            window_us=window_us,
            event_time_col="ts" if evict else None,
            evict_gap_ms=(window_us // 1000) if evict else None,
        )
        seen: list = []
        q = (
            conv.writeStream.foreachBatch(
                lambda bdf, _bid: seen.extend(bdf.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", f"{tmpdir}/fck_{evict}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        key = lambda r: (r.user_id, r.view_event_id, r.purchase_event_id, r.lag_sec)
        return sorted(map(key, seen)), _state_rows_per_batch(q)

    base, base_state = run(evict=False)
    got, state_rows = run(evict=True)

    assert got == base
    assert (1, 10, 11, 4 * 60) in base
    assert (2, 20, 21, 10 * 60) in base and (2, 30, 31, 10 * 60) in base
    # u1's register evicted; u2's survives (its last view is within the
    # horizon of the final watermark)
    assert max(state_rows) == 2
    assert state_rows[-1] == 1
    assert base_state[-1] == 2
