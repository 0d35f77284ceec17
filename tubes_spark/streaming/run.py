"""Streaming runners: sources, multi-sink foreachBatch, replay,
takeWhile stream termination.

* ``prompt`` (Tubes.hs:182-189, line-by-line stdin source)  ->
  :func:`socket_source` / :func:`rate_source` / file stream.
* ``display`` (Tubes.hs:193-196) -> console sink.
* ``runTube`` streaming half (Tubes/Core.hs:255-262) ->
  :func:`run_stream` with ``Trigger.AvailableNow`` for bounded drains.
* ``takeWhile`` (Tubes/Util.hs:104-113, ends the WHOLE stream at the
  first violation) -> :func:`take_while_stream`.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tubes_spark.sink import Sink


def state_sized_shuffle(
    spark: SparkSession, n: "int | None" = None, exact: bool = False
):
    """Context manager: run the enclosed STREAMING query start under a
    state-sized ``spark.sql.shuffle.partitions``, restoring the
    session's previous value on exit (r13 optimization, guide §2/§5).

    A stateful micro-batch commits one state-store file per shuffle
    partition per trigger, and every trigger schedules that many tasks
    — so the partition count should be sized to the STATE VOLUME, not
    the core count (the bench's own drain measured 62k -> 94k ev/s
    going 8 -> 4 partitions at sf0.1, and a vanilla driver session runs
    these drains at the 200 default: 200 state files per trigger for a
    few thousand state rows).  The default is
    ``min(current, $TUBES_SPARK_STREAM_PARTS or 4)`` — parameterised so
    a deployment with genuinely large keyed state raises it (state
    should be ~100 MB-1 GB per partition, the same sizing rule as any
    shuffle), while a query that already chose a smaller count keeps
    it.  r14 re-sweep of the JVM-state default (8 vs 4, best-of-3 at
    sf0.1/local[32]): 4 won or tied on all eight drains measured —
    `streaming_dedup_watermark` 5.9 -> 3.3 s, `streaming_session_dynamic`
    5.2 -> 2.6 s, `streaming_sliding_10m` 3.0 -> 2.6 s,
    `streaming_topk_spacesaving` 4.1 -> 3.4 s — consistent with the
    stack-sampled forensics that every state partition pays a
    serialized provider-registration section per trigger
    (StateStore.getStateStoreProvider holds the JVM-global
    loadedProviders lock around an askSync coordinator RPC).  Even the
    largest gate-SF state (~46 MB) sits below the ~100 MB-per-partition
    floor, so 4 is the data-volume answer, not a core-count tune.  ``exact=True`` sets ``n`` verbatim (no min with the current
    value): measured per-query, drains dominated by PER-KEY Python
    state (applyInPandasWithState over many groups) want MORE
    partitions than the JVM-state default — each partition is one
    Python worker walking its groups serially, so the sweet spot
    balances per-partition commit overhead against groups-per-worker
    (fold-eviction sweep at sf0.1: 17.9 s @ 4, 12.5 s @ 8, 10.6 s @ 16,
    15.4 s @ 32).  Streaming queries pin the count into the checkpoint's offset
    metadata at start, so restoring the session value afterwards never
    touches a running stream.  Partition count never changes WHAT any
    keyed/windowed operator computes — only how it is sharded — which
    the driver gate independently re-verifies against the oracle."""
    import contextlib
    import os

    @contextlib.contextmanager
    def _scope():
        key = "spark.sql.shuffle.partitions"
        cap = n
        if cap is None:
            cap = int(os.environ.get("TUBES_SPARK_STREAM_PARTS", "0") or 0) or 4
        prev = spark.conf.get(key)
        if exact and n is not None:
            spark.conf.set(key, str(int(n)))
        else:
            try:
                cur = int(prev)
            except (TypeError, ValueError):
                cur = cap
            spark.conf.set(key, str(min(cur, int(cap))))
        # r13 (guide §7.3): Spark 4.1's checkpoint-file checksum twin
        # leaks its writer threads (~128 per bounded drain, measured
        # 8.3 s -> 32.6 s over 8 drains of the stream-stream join) and
        # doubles the per-trigger checkpoint file count.  These drains
        # use ephemeral per-query checkpoints whose results face the
        # oracle gate, so integrity twins buy nothing — disable at
        # query start (the conf pins into the started query), restore
        # after.  get_spark defaults it off session-wide too; this
        # scope covers drains running under a VANILLA session (the
        # external driver), where the leak otherwise accumulates
        # across its 270+-query correctness battery.
        # ADVICE r13: a session that EXPLICITLY opted back into checksum
        # twins (builder-level conf, detectable via the SparkContext
        # conf) wins over this ephemeral-checkpoint heuristic; only the
        # engine-default (or get_spark's own default) is lowered here.
        # A runtime `spark.conf.set` opt-in is indistinguishable from
        # the engine default through the public conf API — such
        # deployments set TUBES_SPARK_CKPT_CHECKSUM=true instead.
        ck = "spark.sql.streaming.checkpoint.fileChecksum.enabled"
        prev_ck = None
        try:
            explicit = spark.sparkContext.getConf().contains(ck) and (
                os.environ.get("TUBES_SPARK_CKPT_CHECKSUM") is None
                and spark.sparkContext.getConf().get(ck) == "true"
            )
            if not explicit:
                prev_ck = spark.conf.get(ck)
        except Exception:
            prev_ck = None
        if prev_ck is not None:
            spark.conf.set(
                ck, os.environ.get("TUBES_SPARK_CKPT_CHECKSUM", "false")
            )
        try:
            yield
        finally:
            spark.conf.set(key, prev)
            if prev_ck is not None:
                spark.conf.set(ck, prev_ck)

    return _scope()


def rate_source(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def socket_source(spark: SparkSession, host: str = "localhost", port: int = 9999) -> DataFrame:
    """``prompt`` analog: line stream from a socket."""
    return spark.readStream.format("socket").option("host", host).option("port", port).load()


def file_replay_source(spark: SparkSession, path: str, schema, fmt: str = "parquet",
                       max_files_per_trigger: int = 1) -> DataFrame:
    """Replay a directory of files as a stream (bounded drain with
    AvailableNow) — how the events table is replayed in tests/bench."""
    return (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(path)
    )


def write_ordered_slices(df: DataFrame, conds, path: str,
                         base_epoch: int = 1_700_000_000) -> None:
    """HARNESS-ONLY replay writer: write one filtered slice per trigger
    as a single file with explicit strictly increasing mtimes, so
    FileStreamSource (which orders files by modification time) delivers
    the slices as in-order triggers even when appends land in the same
    millisecond.  A production pipeline ingests an already-partitioned
    log with offsets; this exists to feed oracle-gated streaming
    queries from a bounded table."""
    import glob
    import os

    # r13 (optimization): ONE pass instead of one filter+shuffle+write
    # job per slice — the per-slice form re-ran the whole upstream plan
    # n times (8 slices x ~0.8 s on the full-outer-join feed at sf0.1).
    # Each row is tagged with EVERY slice index whose predicate it
    # matches (explode — identical multiset to the old per-slice
    # filters, including rows matching several conds), hash-partitioned
    # on the slice id so each slice lands in exactly one task, and
    # written once with partitionBy; the files are then lifted into the
    # flat replay dir with the same strictly increasing mtimes.
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    run_id = uuid.uuid4().hex[:8]  # calls may APPEND to the same dir
    staging = tempfile.mkdtemp(prefix="tubes_slices_")
    try:
        tags = F.array_compact(
            F.array(*[F.when(c, F.lit(i)) for i, c in enumerate(conds)])
        )
        try:
            tagged = df.withColumn("__slice__", F.explode(tags))
            tagged.schema  # force analysis before any write side effect
        except Exception:
            # a cond may reference a column df no longer carries —
            # df.filter() resolves such missing references through the
            # child plan, a Project cannot; keep the (slower) per-slice
            # filter path for that case
            _write_slices_per_cond(df, conds, path, base_epoch)
            return
        (
            tagged
            .repartition(max(len(conds), 1), "__slice__")
            .write.partitionBy("__slice__")
            .mode("overwrite")
            .parquet(staging)
        )
        os.makedirs(path, exist_ok=True)
        stamped: set = set()
        for i in range(len(conds)):
            parts = sorted(glob.glob(f"{staging}/__slice__={i}/*.parquet"))
            if not parts:
                # an EMPTY slice must still contribute one (0-row) file:
                # the replay contract is one trigger per slice, and a
                # missing file would renumber every later trigger's
                # foreachBatch epoch id
                df.limit(0).repartition(1).write.mode("append").parquet(path)
                parts = [
                    p for p in glob.glob(f"{path}/*.parquet") if p not in stamped
                ]
                dests = parts
            else:
                dests = []
                for j, p in enumerate(parts):
                    dest = os.path.join(
                        path, f"part-{run_id}-slice{i:05d}-{j}.parquet"
                    )
                    os.replace(p, dest)
                    dests.append(dest)
            for p in dests:
                os.utime(p, (base_epoch + i, base_epoch + i))
                stamped.add(p)
        mtimes = {os.path.getmtime(p) for p in stamped}
        assert len(mtimes) == len(conds), "slice mtimes must be distinct"
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def _write_slices_per_cond(df: DataFrame, conds, path: str,
                           base_epoch: int) -> None:
    """Pre-r13 per-slice writer: one filter+repartition(1)+write job per
    slice.  Kept as the fallback for predicates that only resolve
    through ``df.filter``'s missing-reference lookup."""
    import glob
    import os

    stamped: set = set()
    for i, cond in enumerate(conds):
        df.filter(cond).repartition(1).write.mode("append").parquet(path)
        for p in glob.glob(f"{path}/*.parquet"):
            if p not in stamped:
                os.utime(p, (base_epoch + i, base_epoch + i))
                stamped.add(p)
    mtimes = {os.path.getmtime(p) for p in stamped}
    assert len(mtimes) == len(conds), "slice mtimes must be distinct"


def run_stream(
    df: DataFrame,
    sink: Sink,
    checkpoint: str,
    available_now: bool = True,
    query_name: str = "tubes_stream",
):
    """Start a streaming query that drives the whole sink tree once per
    micro-batch (the canonical multi-sink pattern; at-least-once per
    sink, not atomic across sinks — SURVEY.md §7.4)."""
    w = (
        df.writeStream.queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .foreachBatch(sink.for_each_batch())
        .outputMode("update")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    # the partition count is cloned into the query's own session (and
    # checkpoint offset metadata) inside start(), so restoring the
    # session conf right after is safe for the still-running stream
    with state_sized_shuffle(df.sparkSession):
        return w.start()


def take_while_stream(
    df: DataFrame,
    pred: Column,
    order_col: str,
    on_batch: Callable[[DataFrame], None],
    checkpoint: str,
    available_now: bool = False,
    timeout_s: float = 600.0,
    poll_s: float = 0.2,
):
    """Streaming ``takeWhile`` (Tubes/Util.hs:104-113): emit rows while
    ``pred`` holds; at the FIRST violating row, emit that micro-batch's
    pre-violation prefix, then terminate the whole query — the
    reference's takeWhile ends the entire stream, not just one element.

    Mechanics (the SURVEY §7.4-4 hard part): Structured Streaming has no
    in-plan "stop the query" operator, so the cut is detected inside
    ``foreachBatch`` — arrival order across batches is trigger order,
    order *within* a batch is ``order_col`` — and a driver-side flag
    requests the stop.  ``query.stop()`` must NOT be called from the
    micro-batch thread (it joins that thread -> deadlock), so this
    helper owns the polling loop and calls stop from the caller's
    thread.  Once the flag is set, any further batch that races in
    before the stop lands emits nothing, so no post-violation row is
    ever delivered.

    Violations are null-safe: a NULL predicate is a violation (the
    reference's ``a -> Bool`` has no third value to hide behind).
    Blocks until the query terminates; returns the cut order value
    (None if the stream drained without a violation — only possible
    with ``available_now=True``)."""
    state: dict = {"cut": None, "stop": False}
    holds = F.coalesce(pred, F.lit(False))

    def handle(bdf: DataFrame, _bid: int) -> None:
        if state["stop"]:
            return
        cut = bdf.filter(~holds).agg(F.min(order_col)).first()[0]
        if cut is None:
            on_batch(bdf)
        else:
            on_batch(bdf.filter(F.col(order_col) < F.lit(cut)))
            state["cut"] = cut
            state["stop"] = True

    w = (
        df.writeStream.foreachBatch(handle)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    with state_sized_shuffle(df.sparkSession):
        q = w.start()
    import time

    deadline = time.monotonic() + timeout_s
    while q.isActive and time.monotonic() < deadline:
        if state["stop"]:
            q.stop()
            break
        q.awaitTermination(poll_s)
    q.awaitTermination(max(deadline - time.monotonic(), 1.0))
    return state["cut"]


def merge_streams_event_time(
    a: DataFrame,
    b: DataFrame,
    order_by: "list[str]",
    name: str,
    timeout_s: int = 600,
) -> DataFrame:
    """Reference-faithful ``merge`` interleave for REPLAYABLE streams
    (Tubes/Source.hs:180-193): drain both sides with AvailableNow, rank
    each by event time (``order_by``), then round-robin on (rank, side)
    — element i of stream A precedes element i of stream B precedes
    element i+1, exactly the reference's synchronous order, but w.r.t.
    event time rather than nondeterministic arrival order.

    This closes the semantic delta for bounded replays; LIVE unbounded
    streams keep the documented arrival-order ``union`` divergence
    (SURVEY §7.4-1) — a total event-time rank over an unbounded stream
    would require unbounded state.  The drain goes through a memory
    sink (driver-resident): bounded replays only, by contract."""
    from tubes_spark.source import Source

    da = drain_to_df(a, f"{name}_a", output_mode="append", timeout_s=timeout_s)
    db = drain_to_df(b, f"{name}_b", output_mode="append", timeout_s=timeout_s)
    return Source.from_df(da, order_by).merge(Source.from_df(db, order_by)).ordered()


def merge_streams_interleaved(
    a: DataFrame,
    b: DataFrame,
    order_by: "list[str]",
    out_dir: str,
    checkpoint: str,
    timeout_s: int = 600,
    keep_keys: bool = False,
) -> DataFrame:
    """INCREMENTAL reference interleave (Tubes/Source.hs:180-193) — the
    streaming-native successor to :func:`merge_streams_event_time`,
    which drains to a driver memory sink first.  Here every trigger
    does bounded work and the result accumulates in a parquet sink:

    * tag each side, union the streams;
    * per batch, rank each side by event time (window partitioned by
      the side tag — two partitions, batch-bounded) and add the side's
      RUNNING offset, giving each element its global per-side sequence
      number ``rn``;
    * append rows keyed ``(rn, side)`` to the sink.  The interleave is
      defined by the KEY — element i of A precedes element i of B
      precedes element i+1 — so no global sort ever runs inside the
      stream; readers order by (rn, side) at consumption, exactly like
      any log-ordered table.

    Cross-batch state is the pair of per-side offsets, and they are
    PERSISTED: every epoch commit also writes a tiny JSON ledger entry
    (``out_dir/_offsets/epoch=N.json``) recording the offsets in force
    BEFORE the batch (``pre``) and after it (``post``).  On every batch
    the handler derives its pre-offsets from the ledger, never from
    call-local memory — so a batch replayed after a crash (same
    checkpoint, same sink) reranks with the SAME pre-offsets and
    rewrites its own epoch directory byte-identically, and a brand-NEW
    call pointed at a half-finished checkpoint + sink resumes exactly
    where the dead one stopped.  (Directories starting with ``_`` are
    hidden from Spark's file listing, so the ledger never pollutes the
    parquet read.)  Correctness still requires per-side in-order
    delivery across triggers (time-sliced replay files or log offsets),
    the same contract as the funnel operator — and since r9 that
    contract is GUARDED, not just documented: every ledger entry also
    records each side's max event time, and a batch whose side-minimum
    undercuts the recorded max raises immediately (a misordered replay
    would otherwise silently misinterleave).  An in-order replay of the
    same slices re-reads its own ledger entry and passes untouched.

    Returns the interleaved bounded result after an AvailableNow drain,
    in reference order with the plumbing columns dropped —
    ``keep_keys=True`` keeps them as (rn, side) instead, so a consumer
    (or an oracle) can verify the interleave positionally without any
    global sort."""
    import json
    import os

    cols = list(a.columns)
    u = a.withColumn("__src__", F.lit(0)).unionByName(
        b.withColumn("__src__", F.lit(1))
    )
    ledger_dir = os.path.join(out_dir, "_offsets")
    os.makedirs(ledger_dir, exist_ok=True)

    def _ser_ev(v):
        """JSON-safe, order-preserving encoding of an event-time value:
        datetimes to fixed-microsecond ISO strings (lexical order ==
        time order), numerics/strings as-is."""
        import datetime

        if isinstance(v, datetime.datetime):
            return v.strftime("%Y-%m-%dT%H:%M:%S.%f")
        return v

    def _pre_state(bid: int) -> "tuple[dict[int, int], dict[int, object]]":
        """(offsets, per-side max event time) in force before batch
        ``bid``: this batch's own ledger entry if it exists (we are
        REPLAYING it), else the ``post`` of the newest committed epoch
        below it, else zero/empty.  Entries from the pre-r9 layout have
        no ``max_ev`` field and load as unguarded."""
        def load(path, key):
            with open(path) as f:
                e = json.load(f)
            return (
                {int(k): v for k, v in e[key].items()},
                {int(k): v for k, v in e.get(f"max_ev_{key}", {}).items()},
            )

        own = os.path.join(ledger_dir, f"epoch={bid}.json")
        if os.path.exists(own):
            return load(own, "pre")
        best = None
        for name in os.listdir(ledger_dir):
            if name.startswith("epoch=") and name.endswith(".json"):
                e = int(name[len("epoch="):-len(".json")])
                if e < bid and (best is None or e > best):
                    best = e
        if best is None:
            return {0: 0, 1: 0}, {}
        return load(os.path.join(ledger_dir, f"epoch={best}.json"), "post")

    def handle(bdf, _bid):
        from pyspark.sql import Window

        bid = int(_bid)
        pre, pre_max = _pre_state(bid)
        # in-order delivery guard (VERDICT-r8 #7): a side whose new
        # minimum event time undercuts its recorded max has been
        # replayed out of order — the running offsets would assign it
        # ranks AFTER rows it precedes in event time.  Fail loudly now
        # instead of silently misinterleaving.
        oc = F.col(order_by[0])
        stats = (
            bdf.groupBy("__src__")
            .agg(F.count(F.lit(1)).alias("cnt"), F.min(oc).alias("mn"),
                 F.max(oc).alias("mx"))
            .collect()
        )
        batch_minmax = {
            int(r["__src__"]): (_ser_ev(r["mn"]), _ser_ev(r["mx"]))
            for r in stats
        }
        for side, (mn, _mx) in batch_minmax.items():
            prior = pre_max.get(side)
            if prior is not None and mn is not None and mn < prior:
                raise RuntimeError(
                    f"out-of-order delivery on side {side} at epoch {bid}: "
                    f"batch min event time {mn!r} undercuts the ledger's "
                    f"delivered max {prior!r}; the interleave contract "
                    "requires per-side in-order slices"
                )
        w = Window.partitionBy("__src__").orderBy(*[F.col(c) for c in order_by])
        ranked = (
            bdf.withColumn("__bn__", F.row_number().over(w))
            .withColumn(
                "__rn__",
                F.col("__bn__")
                + F.when(F.col("__src__") == 0, F.lit(pre[0])).otherwise(
                    F.lit(pre[1])
                ),
            )
            .drop("__bn__")
        )
        # per-epoch OVERWRITE directory (same layout as
        # Sink.exactly_once_parquet): a batch replayed after a mid-drain
        # crash rewrites its own directory instead of appending
        # duplicate (rn, side) rows — idempotence from the path
        ranked.write.mode("overwrite").parquet(f"{out_dir}/epoch={bid}")
        post = dict(pre)
        post_max = dict(pre_max)
        for r in stats:
            side = int(r["__src__"])
            post[side] += int(r["cnt"])
            mx = _ser_ev(r["mx"])
            if mx is not None:
                cur = post_max.get(side)
                post_max[side] = mx if cur is None else max(cur, mx)
        # ledger entry commits last (atomic rename), AFTER the data
        # write: a crash between the two replays the batch with the
        # same pre-offsets and rewrites the same bytes
        entry = json.dumps(
            {"pre": {str(k): v for k, v in pre.items()},
             "post": {str(k): v for k, v in post.items()},
             "max_ev_pre": {str(k): v for k, v in pre_max.items()},
             "max_ev_post": {str(k): v for k, v in post_max.items()}}
        )
        tmp_path = os.path.join(ledger_dir, f".epoch={bid}.json.tmp")
        with open(tmp_path, "w") as f:
            f.write(entry)
        os.replace(tmp_path, os.path.join(ledger_dir, f"epoch={bid}.json"))

    with state_sized_shuffle(u.sparkSession):
        q = (
            u.writeStream.foreachBatch(handle)
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)
    out = a.sparkSession.read.option("basePath", out_dir).parquet(
        f"{out_dir}/epoch=*"
    )
    if keep_keys:
        return out.select(
            *cols,
            F.col("__rn__").cast("long").alias("rn"),
            F.col("__src__").cast("int").alias("side"),
        )
    return out.orderBy("__rn__", "__src__").select(*cols)


def drain_to_df(df: DataFrame, name: str, output_mode: str = "complete",
                timeout_s: int = 600,
                shuffle_partitions: "int | None" = None) -> DataFrame:
    """Run a bounded streaming plan to completion (AvailableNow) into a
    memory sink and return the final result table — the bridge that lets
    streaming plans face the same oracle gate as batch ones.  Memory
    sink rows live on the driver: only use for aggregated (small)
    results.  ``shuffle_partitions`` overrides the state-sized default
    exactly (see :func:`state_sized_shuffle` — per-key-Python-state
    drains measure faster with more partitions than the JVM-state
    default)."""
    with state_sized_shuffle(
        df.sparkSession, n=shuffle_partitions,
        exact=shuffle_partitions is not None,
    ):
        q = (
            df.writeStream.queryName(name)
            .format("memory")
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)
    return df.sparkSession.table(name)
