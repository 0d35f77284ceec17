"""Structured Streaming tests: the Pump side (SURVEY.md §5 item 4).

Covers: resumable keyed fold via applyInPandasWithState with
stop/restart-from-checkpoint (the reference's pump resumption,
Tubes/Util.hs:158-172), multi-sink foreachBatch, windowed agg with
watermark on a replayed file stream."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tubes_spark.catalog import load_table
from tubes_spark.sink import Sink
from tubes_spark.source import Source
from tubes_spark.streaming.run import (
    file_replay_source,
    merge_streams_event_time,
    run_stream,
    take_while_stream,
)
from tubes_spark.streaming.state import running_fold

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="tubes_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _events_stream(spark, src_dir: str):
    schema = load_table(spark, "events", SF).schema
    return file_replay_source(spark, src_dir, schema)


def _prep_events_dir(spark, tmpdir: str, n_files: int = 4) -> str:
    """Split the events table into several parquet files so the stream
    replays as several micro-batches."""
    src = f"{tmpdir}/in"
    load_table(spark, "events", SF).repartition(n_files).write.parquet(src)
    return src


def test_streaming_fold_matches_batch(spark, tmpdir):
    """Streaming keyed fold over a replay == batch groupBy sum."""
    src_dir = _prep_events_dir(spark, tmpdir)
    stream = _events_stream(spark, src_dir)
    folded = running_fold(stream, ["user_id"], "value")
    q = (
        folded.writeStream.format("memory")
        .queryName("fold_out")
        .outputMode("update")
        .option("checkpointLocation", f"{tmpdir}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last update per key = final accumulator
    out = spark.sql(
        "SELECT key, max_by(acc, n) AS acc, max(n) AS n FROM fold_out GROUP BY key"
    ).collect()
    got = {int(r["key"]): (round(r["acc"], 6), r["n"]) for r in out}
    expect = {
        r["user_id"]: (round(r["s"], 6), r["n"])
        for r in load_table(spark, "events", SF)
        .groupBy("user_id")
        .agg(F.sum("value").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expect


def test_streaming_fold_resumes_from_checkpoint(spark, tmpdir):
    """Stop the query, add more data, restart with the same checkpoint:
    state continues (pump resumption, Tubes/Util.hs:158-172)."""
    src = f"{tmpdir}/in"
    e = load_table(spark, "events", SF)
    first = e.filter(F.col("event_id") < 500)
    second = e.filter(F.col("event_id") >= 500)
    first.coalesce(1).write.mode("append").parquet(src)

    def drain():
        """The memory sink can't recover from a checkpoint; foreachBatch can."""
        rows = []
        stream = _events_stream(spark, src)
        folded = running_fold(stream, ["user_id"], "value")
        q = (
            folded.writeStream.foreachBatch(lambda df, bid: rows.extend(df.collect()))
            .outputMode("update")
            .option("checkpointLocation", f"{tmpdir}/ck")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return rows

    drain()                       # phase 1: first half only
    second.coalesce(1).write.mode("append").parquet(src)
    rows2 = drain()               # phase 2: resumes, sees only new files
    got = {}
    for r in rows2:               # last update per key = final accumulator
        k = int(r["key"])
        got[k] = max(got.get(k, 0), r["n"])
    expect_n = {
        r["user_id"]: r["n"]
        for r in e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
        # phase-2 memory sink only holds keys updated in phase 2
        if r["user_id"] in {x["user_id"] for x in second.select("user_id").distinct().collect()}
    }
    for k, n in got.items():
        assert n == expect_n[k], f"user {k}: resumed count {n} != total {expect_n[k]}"


def test_multi_sink_foreachbatch(spark, tmpdir):
    """Sink broadcast + choose tree driven by one streaming query
    (Tubes/Sink.hs:118-119 over micro-batches)."""
    src_dir = _prep_events_dir(spark, tmpdir)
    stream = _events_stream(spark, src_dir).select("event_id", "value")
    hi, lo, allrows = [], [], []
    sink = Sink.choose(F.col("value") >= 50, Sink.memory(hi), Sink.memory(lo)) + Sink.memory(allrows)
    q = run_stream(stream, sink, checkpoint=f"{tmpdir}/ck2")
    q.awaitTermination(120)
    n = load_table(spark, "events", SF).count()
    assert len(allrows) == n
    assert len(hi) + len(lo) == n


def test_windowed_agg_with_watermark(spark, tmpdir):
    """Tumbling window + watermark over the replayed stream equals the
    batch window aggregation (AvailableNow drains everything)."""
    src_dir = _prep_events_dir(spark, tmpdir)
    stream = _events_stream(spark, src_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_out")
        .outputMode("complete")
        .option("checkpointLocation", f"{tmpdir}/ck3")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["win"]["start"], r["n"]) for r in spark.sql("SELECT win, n FROM win_out").collect()
    }
    expect = {
        (r["win"]["start"], r["n"])
        for r in load_table(spark, "events", SF)
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expect


def test_stream_stream_join_with_watermarks(spark, tmpdir):
    """Interval-bounded stream-stream inner join (view joined to the
    same user's purchases within +/-1h) equals the identical batch join.
    Watermarks bound the join state at scale."""
    src_dir = _prep_events_dir(spark, tmpdir)
    stream = _events_stream(spark, src_dir)

    def split(df, suffix):
        side = df.filter(F.col("event_type") == ("view" if suffix == "v" else "purchase"))
        return side.select(
            *[F.col(c).alias(f"{c}_{suffix}") for c in ("event_id", "user_id", "ts", "value")]
        )

    # the replay files are NOT time-ordered, so a tight watermark would
    # drop "late" rows; 40 days covers the whole synthetic span while
    # still exercising watermark-bounded join state
    sv = split(stream, "v").withWatermark("ts_v", "40 days")
    sp = split(stream, "p").withWatermark("ts_p", "40 days")
    cond = (
        (F.col("user_id_v") == F.col("user_id_p"))
        & (F.col("ts_p") >= F.col("ts_v") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("ts_p") <= F.col("ts_v") + F.expr("INTERVAL 1 HOUR"))
    )
    joined = sv.join(sp, cond)
    q = (
        joined.writeStream.format("memory").queryName("ssj_out")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir}/ck_ssj")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT count(*) AS n FROM ssj_out").collect()[0]["n"]

    e = load_table(spark, "events", SF)
    bv = split(e, "v")
    bp = split(e, "p")
    expect = bv.join(bp, cond).count()
    assert got == expect and expect > 0


def test_streaming_dropduplicates_within_watermark(spark, tmpdir):
    """Streaming exact dedup on event_id: re-append the same files and
    drain again with the same checkpoint — replayed duplicates are
    suppressed by dropDuplicates state."""
    src = f"{tmpdir}/in"
    e = load_table(spark, "events", SF).limit(800)
    e.coalesce(1).write.mode("append").parquet(src)

    def drain(qname):
        rows = []
        stream = _events_stream(spark, src)
        dedup = stream.select("event_id", "user_id", "value").dropDuplicates(["event_id"])
        q = (
            dedup.writeStream.foreachBatch(lambda df, bid: rows.extend(df.collect()))
            .outputMode("update")
            .option("checkpointLocation", f"{tmpdir}/ck_dd")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return rows

    first = drain("dd1")
    assert len(first) == 800
    # identical data arrives again as new files -> all duplicates
    e.coalesce(1).write.mode("append").parquet(src)
    second = drain("dd2")
    assert len(second) == 0, f"{len(second)} dupes leaked"


def test_streaming_takewhile_terminates_query(spark, tmpdir):
    """takeWhile on an UNBOUNDED stream (no AvailableNow): the violation
    arrives mid-replay; the query must emit exactly the pre-violation
    prefix — nothing from later batches — and stop itself instead of
    running forever (Tubes/Util.hs:104-113 ends the whole stream)."""
    import os

    src = f"{tmpdir}/in"
    e = load_table(spark, "events", SF).orderBy("event_id").limit(1000)
    # 4 sequential files, 250 ids each, mtimes forced increasing so the
    # file source replays them in this order (one file per trigger).
    # Part filenames are random UUIDs, so track each write's new file
    # by directory diff — NOT by sorted name.
    seen: set = set()
    for i in range(4):
        e.filter((F.col("event_id") >= i * 250) & (F.col("event_id") < (i + 1) * 250)) \
            .coalesce(1).write.mode("append").parquet(src)
        new = {f for f in os.listdir(src) if f.endswith(".parquet")} - seen
        assert len(new) == 1
        os.utime(f"{src}/{new.pop()}", (1_700_000_000 + i, 1_700_000_000 + i))
        seen = {f for f in os.listdir(src) if f.endswith(".parquet")}

    rows = []
    stream = file_replay_source(spark, src, e.schema, max_files_per_trigger=1)
    cut = take_while_stream(
        stream.select("event_id", "value"),
        F.col("event_id") < 600,          # first violation inside file 3
        "event_id",
        lambda bdf: rows.extend(bdf.collect()),
        checkpoint=f"{tmpdir}/ck_tw",
        available_now=False,              # unbounded: only the cut stops it
        timeout_s=120,
    )
    assert cut == 600
    got = sorted(r["event_id"] for r in rows)
    assert got == list(range(600)), (
        f"emitted {len(got)} rows; min={got[0] if got else None} max={got[-1] if got else None}"
    )


def test_streaming_merge_event_time_order(spark, tmpdir):
    """Replayable-stream merge: event-time-ranked round-robin equals the
    batch Source.merge on the same ranking — the reference interleave,
    not arrival order (closes the SURVEY §7.4-1 delta for replays)."""
    src_dir = _prep_events_dir(spark, tmpdir)
    stream = _events_stream(spark, src_dir)
    sv = stream.filter(F.col("event_type") == "view").select("event_id", "ts", "user_id")
    sp = stream.filter(F.col("event_type") == "purchase").select("event_id", "ts", "user_id")
    got = merge_streams_event_time(sv, sp, ["ts", "event_id"], "met").collect()

    e = load_table(spark, "events", SF)
    bv = e.filter(F.col("event_type") == "view").select("event_id", "ts", "user_id")
    bp = e.filter(F.col("event_type") == "purchase").select("event_id", "ts", "user_id")
    expect = (
        Source.from_df(bv, ["ts", "event_id"])
        .merge(Source.from_df(bp, ["ts", "event_id"]))
        .ordered()
        .collect()
    )
    assert [r["event_id"] for r in got] == [r["event_id"] for r in expect]
    assert len(got) > 0


def test_streaming_session_window(spark, tmpdir):
    """Session windows (30 min gap) on the replayed stream equal the
    batch session aggregation."""
    src_dir = _prep_events_dir(spark, tmpdir)
    stream = _events_stream(spark, src_dir)
    agg = (
        stream.withWatermark("ts", "40 days")  # replay is not time-ordered
        .groupBy(F.session_window("ts", "30 minutes").alias("win"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory").queryName("sess_out")
        .outputMode("complete")
        .option("checkpointLocation", f"{tmpdir}/ck_sess")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["win"]["start"], r["n"])
        for r in spark.sql("SELECT user_id, win, n FROM sess_out").collect()
    }
    expect = {
        (r["user_id"], r["win"]["start"], r["n"])
        for r in load_table(spark, "events", SF)
        .groupBy(F.session_window("ts", "30 minutes").alias("win"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expect


def test_watermark_drops_late_event(spark, tmpdir):
    """A TIGHT watermark must actually drop late data: an event arriving
    two micro-batches after the watermark passed its window's end may
    not be counted (every other streaming test uses a huge watermark to
    match batch; this pins the bounded-state trade itself)."""
    import os
    import time

    src = f"{tmpdir}/in"
    os.makedirs(src)

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(rows, "ts timestamp, user_id long")
        df.coalesce(1).write.parquet(f"{tmpdir}/stage_{name}")
        part = next(
            p for p in os.listdir(f"{tmpdir}/stage_{name}") if p.endswith(".parquet")
        )
        dst = f"{src}/{name}.parquet"
        os.rename(f"{tmpdir}/stage_{name}/{part}", dst)
        os.utime(dst, (mtime, mtime))

    from datetime import datetime

    ts = lambda h, m: datetime(2024, 1, 1, h, m)
    t0 = time.time()
    # batch 1: one event in the 10:00 window, one at 12:00 that will
    # push the watermark to 11:50 — past the 10:00 window's end
    write_file("b1", [(ts(10, 5), 1), (ts(12, 0), 2)], t0 - 90)
    # batch 2: advances the watermark again (to 12:50); the 10:00 window
    # is now closed and emitted.  (A late row in THIS batch would be an
    # eviction-ordering edge — Spark merges a batch's input before
    # evicting, so same-batch late rows can still be counted; the
    # guarantee starts one batch later.)
    write_file("b2", [(ts(13, 0), 5)], t0 - 60)
    # batch 3: a LATE event for the long-finalized 10:00 window, plus
    # one at 14:00 so the 12:00 window also closes
    write_file("b3", [(ts(10, 30), 3), (ts(14, 0), 4)], t0 - 30)

    schema = "ts timestamp, user_id long"
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .load(src)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_drop_out")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir}/ck_late")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["win"]["start"].strftime("%H:%M"): r["n"]
        for r in spark.sql("SELECT win, n FROM late_drop_out").collect()
    }
    # the 10:00 window closed with ONLY the on-time event; the late
    # 10:30 event was dropped (batch semantics would say n=2)
    assert got.get("10:00") == 1, got
    # the 12:00 window closed once 14:00 advanced the watermark
    assert got.get("12:00") == 1, got


def test_funnel_state_crosses_batches(spark, tmpdir):
    """A view in trigger 1 must convert a purchase in trigger 2 (state
    handoff), a purchase outside the window must not convert, and a
    purchase with no preceding view must emit nothing."""
    import uuid

    from tubes_spark.streaming.funnel import funnel_conversions_stream
    from tubes_spark.streaming.run import drain_to_df

    MIN = 60 * 1_000_000  # one minute in micros
    batch1 = [
        (1, 10 * MIN, 100, "view"),      # converts in batch 2
        (2, 10 * MIN, 101, "view"),      # too old for user 2's purchase
        (3, 10 * MIN, 102, "purchase"),  # no preceding view: no emit
    ]
    batch2 = [
        (1, 30 * MIN, 200, "purchase"),   # 20 min after view -> converts
        (2, 200 * MIN, 201, "purchase"),  # 190 min after view -> no
        (3, 210 * MIN, 202, "view"),      # view after purchase: no pair
    ]
    schema = "user_id long, ts_us long, event_id long, event_type string"
    for rows in (batch1, batch2):  # sequential writes -> ordered triggers
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
            f"{tmpdir}/funnel_in"
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmpdir}/funnel_in")
    )
    conv = funnel_conversions_stream(stream.groupBy("user_id"), window_us=30 * MIN)
    out = drain_to_df(conv, f"funnel_t_{uuid.uuid4().hex[:8]}", output_mode="append")
    rows = sorted((r.user_id, r.view_event_id, r.purchase_event_id, r.lag_sec)
                  for r in out.collect())
    assert rows == [(1, 100, 200, 1200)]


def test_funnel_state_survives_restart(spark, tmpdir):
    """Stop the funnel query entirely, then start a NEW query on the
    same checkpoint after more data arrives: the last-view register
    must come back from the state store — a view seen before the stop
    converts a purchase that arrives after it (the reference's pump
    resumption, Tubes/Util.hs:158-172, on real checkpoint state)."""
    from tubes_spark.streaming.funnel import funnel_conversions_stream

    MIN = 60 * 1_000_000
    schema = "user_id long, ts_us long, event_id long, event_type string"
    seen = []

    def run_drain(ck: str):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{tmpdir}/funnel_r_in")
        )
        conv = funnel_conversions_stream(stream.groupBy("user_id"), window_us=30 * MIN)
        q = (
            conv.writeStream.foreachBatch(
                lambda bdf, _bid: seen.extend(bdf.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", f"{tmpdir}/funnel_r_ck")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    spark.createDataFrame(
        [(7, 10 * MIN, 100, "view")], schema
    ).coalesce(1).write.mode("append").parquet(f"{tmpdir}/funnel_r_in")
    run_drain("a")  # first lifecycle: view only, no emission
    assert seen == []

    spark.createDataFrame(
        [(7, 25 * MIN, 200, "purchase")], schema
    ).coalesce(1).write.mode("append").parquet(f"{tmpdir}/funnel_r_in")
    run_drain("b")  # fresh query, same checkpoint: state must resume
    assert [(r.user_id, r.view_event_id, r.purchase_event_id, r.lag_sec)
            for r in seen] == [(7, 100, 200, 900)]


def test_funnel_restart_matches_uninterrupted_run(spark, tmpdir):
    """The VERDICT-r5 bar for keyed *pattern* state: run the same
    time-sliced replay once uninterrupted and once with a hard
    stop/restart from checkpoint in the middle — the union of
    conversions across both lifecycles must equal the uninterrupted
    run's exactly.  The data plants conversions that straddle the
    restart boundary (view in the last pre-stop slice, purchase in the
    first post-restart slice), so equality proves the last-view
    register is rehydrated from the state store, not recomputed."""
    from tubes_spark.streaming.funnel import funnel_conversions_stream

    MIN = 60 * 1_000_000
    schema = "user_id long, ts_us long, event_id long, event_type string"
    # six time slices; conversions in-slice, cross-slice, and
    # cross-RESTART (slice 2 view -> slice 3 purchase); u4's gap
    # exceeds the 30-min window (no emission); u5 purchase precedes
    # any view (no emission)
    slices = [
        [(1, 1 * MIN, 10, "view"), (2, 2 * MIN, 11, "view")],
        [(1, 5 * MIN, 20, "purchase"), (3, 6 * MIN, 21, "view"),
         (4, 7 * MIN, 22, "view")],
        [(2, 12 * MIN, 30, "purchase"), (1, 13 * MIN, 31, "view"),
         (5, 14 * MIN, 32, "purchase")],
        # ---- restart happens here in the interrupted run ----
        [(1, 20 * MIN, 40, "purchase"), (3, 21 * MIN, 41, "purchase")],
        [(4, 45 * MIN, 50, "purchase"), (5, 46 * MIN, 51, "view")],
        [(5, 50 * MIN, 60, "purchase"), (1, 51 * MIN, 61, "purchase")],
    ]

    def write_slice(dest: str, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(dest)

    def drain(src: str, ck: str, seen: list):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        conv = funnel_conversions_stream(stream.groupBy("user_id"), window_us=30 * MIN)
        q = (
            conv.writeStream.foreachBatch(
                lambda bdf, _bid: seen.extend(bdf.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    key = lambda r: (r.user_id, r.view_event_id, r.purchase_event_id, r.lag_sec)

    # lifecycle A: everything in one uninterrupted drain
    full_seen: list = []
    for s in slices:
        write_slice(f"{tmpdir}/funnel_full_in", s)
    drain(f"{tmpdir}/funnel_full_in", f"{tmpdir}/funnel_full_ck", full_seen)

    # lifecycle B: drain 3 slices, STOP, add 3 more, restart same ck
    part_seen: list = []
    for s in slices[:3]:
        write_slice(f"{tmpdir}/funnel_part_in", s)
    drain(f"{tmpdir}/funnel_part_in", f"{tmpdir}/funnel_part_ck", part_seen)
    n_pre_stop = len(part_seen)
    for s in slices[3:]:
        write_slice(f"{tmpdir}/funnel_part_in", s)
    drain(f"{tmpdir}/funnel_part_in", f"{tmpdir}/funnel_part_ck", part_seen)

    assert sorted(map(key, part_seen)) == sorted(map(key, full_seen))
    # the dataset really exercises the boundary: some conversions only
    # materialize after the restart, from pre-stop view state
    assert n_pre_stop < len(part_seen)
    post = [key(r) for r in part_seen[n_pre_stop:]]
    assert (1, 31, 40, 7 * 60) in post  # slice-2 view -> slice-3 purchase
    assert len(full_seen) >= 4


def test_merge_streams_interleaved_incremental_golden(spark, tmpdir):
    """The STREAMING-native reference interleave (Tubes/Source.hs:
    180-193, transcript Tubes.hs:154-178): uneven sides A1..A3 and
    B1..B4, replayed as time-sliced files across MULTIPLE triggers,
    must come out A1 B1 A2 B2 A3 B3 B4 — incremental (rn, side)
    keying, not a post-drain global sort.  Slices split mid-side so
    the running offsets are genuinely exercised across batches."""
    from tubes_spark.streaming.run import merge_streams_interleaved

    from pyspark.sql import functions as F

    from tubes_spark.streaming.run import write_ordered_slices

    schema = "seq long, value string"
    # write via write_ordered_slices (strictly increasing mtimes):
    # FileStreamSource orders files by mtime, so plain same-millisecond
    # appends could deliver slices out of order and flake the golden
    a_all = spark.createDataFrame([(1, "A1"), (2, "A2"), (3, "A3")], schema)
    b_all = spark.createDataFrame([(1, "B1"), (2, "B2"), (3, "B3"), (4, "B4")], schema)
    write_ordered_slices(a_all, [F.col("seq") <= 2, F.col("seq") > 2], f"{tmpdir}/mi_a")
    write_ordered_slices(b_all, [F.col("seq") <= 1, F.col("seq") > 1], f"{tmpdir}/mi_b")
    a = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmpdir}/mi_a")
    )
    b = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmpdir}/mi_b")
    )
    out = merge_streams_interleaved(
        a, b, ["seq"], f"{tmpdir}/mi_out", f"{tmpdir}/mi_ck"
    )
    assert [r.value for r in out.collect()] == [
        "A1", "B1", "A2", "B2", "A3", "B3", "B4",
    ]


def test_merge_streams_interleaved_new_call_resumes_mid_drain(spark, tmpdir):
    """ADVICE-r6 medium: per-side offsets must survive a dead driver.
    Drain the first half of each side with call #1, then point a
    brand-NEW merge_streams_interleaved call (fresh Python state) at
    the SAME checkpoint + sink with the remaining slices appended — the
    ledger (`_offsets/epoch=N.json`) must rehydrate the offsets so the
    resumed batches continue the per-side numbering instead of
    restarting at 0, and the final interleave must equal the
    uninterrupted run's exactly."""
    from pyspark.sql import functions as F

    from tubes_spark.streaming.run import (
        merge_streams_interleaved,
        write_ordered_slices,
    )

    schema = "seq long, value string"
    a_all = spark.createDataFrame(
        [(i, f"A{i}") for i in range(1, 6)], schema
    )
    b_all = spark.createDataFrame(
        [(i, f"B{i}") for i in range(1, 8)], schema
    )

    def stream(path):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(path)
        )

    # uninterrupted reference run
    write_ordered_slices(a_all, [F.col("seq") <= 2, F.col("seq").between(3, 4),
                                 F.col("seq") >= 5], f"{tmpdir}/ref_a")
    write_ordered_slices(b_all, [F.col("seq") <= 3, F.col("seq").between(4, 5),
                                 F.col("seq") >= 6], f"{tmpdir}/ref_b")
    ref = merge_streams_interleaved(
        stream(f"{tmpdir}/ref_a"), stream(f"{tmpdir}/ref_b"),
        ["seq"], f"{tmpdir}/ref_out", f"{tmpdir}/ref_ck", keep_keys=True,
    )
    ref_rows = sorted((r.rn, r.side, r.value) for r in ref.collect())

    # interrupted run: call #1 sees only the first slices
    write_ordered_slices(a_all.filter(F.col("seq") <= 2),
                         [F.lit(True)], f"{tmpdir}/cut_a")
    write_ordered_slices(b_all.filter(F.col("seq") <= 3),
                         [F.lit(True)], f"{tmpdir}/cut_b")
    merge_streams_interleaved(
        stream(f"{tmpdir}/cut_a"), stream(f"{tmpdir}/cut_b"),
        ["seq"], f"{tmpdir}/cut_out", f"{tmpdir}/cut_ck", keep_keys=True,
    ).collect()

    # "driver dies"; remaining slices arrive; a brand-new call resumes
    write_ordered_slices(a_all.filter(F.col("seq") > 2),
                         [F.col("seq") <= 4, F.col("seq") >= 5],
                         f"{tmpdir}/cut_a", base_epoch=1_700_000_100)
    write_ordered_slices(b_all.filter(F.col("seq") > 3),
                         [F.col("seq") <= 5, F.col("seq") >= 6],
                         f"{tmpdir}/cut_b", base_epoch=1_700_000_100)
    out = merge_streams_interleaved(
        stream(f"{tmpdir}/cut_a"), stream(f"{tmpdir}/cut_b"),
        ["seq"], f"{tmpdir}/cut_out", f"{tmpdir}/cut_ck", keep_keys=True,
    )
    cut_rows = sorted((r.rn, r.side, r.value) for r in out.collect())
    assert cut_rows == ref_rows
    # and the reference interleave order survives end-to-end
    ordered = [v for (_rn, _s, v) in sorted(
        ((r.rn, r.side, r.value) for r in out.collect()),
        key=lambda t: (t[0], t[1]),
    )]
    assert ordered == ["A1", "B1", "A2", "B2", "A3", "B3",
                       "A4", "B4", "A5", "B5", "B6", "B7"]


def test_exactly_once_multi_sink_converges_after_crash(spark, tmpdir):
    """The multi-sink atomicity upgrade (SURVEY §7.4 item 5): broadcast
    to two exactly_once_parquet sinks, crash BETWEEN them mid-epoch
    (sink A committed, sink B not), restart from the same checkpoint —
    the replayed epoch must fill sink B in and overwrite/skip sink A,
    leaving both sinks with identical committed sets and no duplicate
    rows anywhere."""
    from tubes_spark.sink import _CURRENT_EPOCH, Sink

    schema = "k long, v long"
    src = f"{tmpdir}/eo_in"
    for i in range(4):
        spark.createDataFrame([(i, i * 10)], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    pa, pb = f"{tmpdir}/eo_a", f"{tmpdir}/eo_b"
    sa, sb = Sink.exactly_once_parquet(pa), Sink.exactly_once_parquet(pb)
    boom = {"armed": True}

    def flaky_b(df):
        if boom["armed"] and _CURRENT_EPOCH.get() == 2:
            boom["armed"] = False
            raise RuntimeError("injected crash between sinks")
        sb(df)

    tree = sa + Sink(flaky_b)

    def drain():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.foreachBatch(tree.for_each_batch())
            .option("checkpointLocation", f"{tmpdir}/eo_ck")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(300)
        except Exception:
            pass  # the injected crash surfaces here on the first drain

    drain()
    # transient divergence is the documented bound: A committed epoch 2,
    # B did not
    a_mid = sorted((r.k, r.v) for r in Sink.read_exactly_once(spark, pa)
                   .select("k", "v").collect())
    b_mid = sorted((r.k, r.v) for r in Sink.read_exactly_once(spark, pb)
                   .select("k", "v").collect())
    assert len(a_mid) == len(b_mid) + 1

    drain()  # restart: epoch 2 replays — A skips via marker, B fills in
    want = [(i, i * 10) for i in range(4)]
    for p in (pa, pb):
        got = sorted((r.k, r.v) for r in Sink.read_exactly_once(spark, p)
                     .select("k", "v").collect())
        assert got == want  # identical, converged, duplicate-free


def test_rate_source_live_unbounded_two_triggers(spark, tmpdir):
    """Drive a LIVE unbounded source (the `prompt` analog, Tubes.hs:
    182-189) — no file replay: start the rate source, consume at least
    two non-empty triggers through foreachBatch, assert delivery is the
    gapless monotone sequence the source contracts, and stop cleanly
    from the test thread (never from the micro-batch thread)."""
    import threading

    from tubes_spark.streaming.run import rate_source

    src = rate_source(spark, rows_per_second=200)
    seen: list = []  # (batch_id, [values]) appended by the stream thread
    got_two = threading.Event()

    def handle(bdf, bid):
        # the source spreads a trigger's range across partitions, so
        # collect order is partition-strided — sort to get event order
        vals = sorted(r["value"] for r in bdf.select("value").collect())
        if vals:
            seen.append((bid, vals))
        if len(seen) >= 2:
            got_two.set()

    q = (
        src.writeStream.foreachBatch(handle)
        .option("checkpointLocation", f"{tmpdir}/rate_ck")
        .outputMode("append")
        .start()
    )
    try:
        assert got_two.wait(timeout=120), "fewer than 2 non-empty triggers in 120s"
        assert q.isActive  # genuinely unbounded: still running until we stop it
    finally:
        q.stop()
        q.awaitTermination(60)
    first, second = seen[0], seen[1]
    assert first[0] < second[0]  # trigger ids advance
    # gapless delivery within and monotone across the two triggers
    allv = first[1] + second[1]
    assert allv == list(range(min(allv), min(allv) + len(allv)))
    assert max(first[1]) < min(second[1])


def test_watermark_late_row_filter_lags_one_batch(spark, tmpdir):
    """Pin the engine's late-data protocol (probed empirically, and what
    the streaming_late_data oracle encodes): the late-row filter for
    batch i uses the PREVIOUS batch's watermark while eviction at end of
    batch i uses the current one — so a straggler for a still-live
    window merges even when its window end is below the current wm, and
    a straggler for an already-evicted window is dropped, never
    re-emitted."""
    import datetime as dt
    import os
    import uuid

    from pyspark.sql import functions as F

    from tubes_spark.streaming.run import write_ordered_slices

    T = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731

    def run(rows_slices, path):
        df = spark.createDataFrame(
            [(i, ts, s) for s, rows in enumerate(rows_slices) for (i, ts) in rows],
            "event_id long, ts timestamp, slice int",
        )
        write_ordered_slices(
            df, [F.col("slice") == s for s in range(len(rows_slices))], path
        )
        stream = (
            spark.readStream.schema("event_id long, ts timestamp, slice int")
            .option("maxFilesPerTrigger", "1")
            .parquet(path)
        )
        agg = (
            stream.withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour").alias("win"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("win.start").alias("ws"), "n")
        )
        name = f"wmlate_{uuid.uuid4().hex[:6]}"
        q = (
            agg.writeStream.queryName(name)
            .format("memory")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r["ws"]: r["n"] for r in spark.table(name).collect()}

    # straggler while window still live (wm used by filter is one batch
    # behind): merges, single emission with n=2
    out = run(
        [[(1, T(1, 5)), (2, T(2, 5)), (3, T(3, 10))],
         [(10, T(1, 20)), (11, T(2, 20)), (12, T(4, 10))]],
        f"{tmpdir}/wm_live",
    )
    assert out == {T(1): 2, T(2): 2}

    # straggler AFTER its window was evicted: dropped, no duplicate row
    out = run(
        [[(1, T(1, 5)), (2, T(3, 10))],
         [(3, T(5, 0))],
         [(4, T(1, 20)), (5, T(6, 0))]],
        f"{tmpdir}/wm_evicted",
    )
    assert out == {T(1): 1, T(3): 1}
