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


# --------------------------------------------------------------------------
# Baseline JPEG codec (VERDICT-r6 #8): the last entropy-coded stub is
# now a real encoder/decoder pair.  Flat 8x8 blocks roundtrip EXACTLY
# (the oracle query's foundation); general content is bounded by the
# quantization error budget.
# --------------------------------------------------------------------------

import numpy as np

from tubes_spark.operators.multimodal import (
    decode_jpeg_gray,
    encode_jpeg_gray,
    jpeg_ahash_hex,
    parse_media_header,
)

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


if HAVE_HYPOTHESIS:

    @given(
        st.integers(1, 3), st.integers(1, 8),
        st.lists(st.integers(0, 255), min_size=24, max_size=24),
    )
    @settings(max_examples=40, deadline=None)
    def test_jpeg_flat_blocks_roundtrip_exact(nbh, nbw, vals):
        """Flat 8x8 blocks: AC coefficients are identically 0 and the
        DC level divides its quant step, so the LOSSY codec is exact —
        the invariant the multimodal_jpeg_ahash oracle builds on."""
        grid = np.array(vals[: nbh * nbw]).reshape(nbh, nbw)
        img = np.kron(grid, np.ones((8, 8), int)).astype(np.uint8)
        out = decode_jpeg_gray(encode_jpeg_gray(img))
        assert out.dtype == np.uint8 and out.shape == img.shape
        assert (out == img).all()

    @given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**31 - 1))
    @settings(max_examples=40, deadline=None)
    def test_jpeg_general_roundtrip_bounded(h, w, seed):
        """Arbitrary content (including non-multiple-of-8 dims, which
        exercise edge replication + crop): per-AC-coefficient error is
        <= 1 quant step, so the reconstructed pixel error is bounded."""
        img = np.random.RandomState(seed).randint(0, 256, (h, w)).astype(np.uint8)
        out = decode_jpeg_gray(encode_jpeg_gray(img))
        assert out.shape == img.shape
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 16


def test_jpeg_header_sniffer_agrees_with_encoder():
    """The r5 SOF-walk header sniffer must read back our own SOF0."""
    mime, w, h, _ = parse_media_header(encode_jpeg_gray(np.zeros((24, 56), np.uint8)))
    assert (mime, w, h) == ("image/jpeg", 56, 24)


def test_jpeg_decoder_rejects_malformed():
    for bad in (b"", b"notajpeg", b"\xff\xd8\xff\xd9"):
        with pytest.raises(ValueError):
            decode_jpeg_gray(bad)
    # progressive (SOF2) must be rejected loudly, not mis-decoded
    ok = bytearray(encode_jpeg_gray(np.zeros((8, 8), np.uint8)))
    sof = ok.index(b"\xff\xc0")
    ok[sof + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(ok))


def test_jpeg_byte_stuffing_and_zrl_paths():
    """An image tuned to produce 0xFF entropy bytes and long zero runs
    exercises byte stuffing and the ZRL (16-zero-run) symbol."""
    rng = np.random.RandomState(42)
    for _ in range(10):
        img = np.zeros((8, 8), np.uint8)
        img[0, 0] = rng.randint(0, 256)  # sparse corner -> long AC runs
        img[7, 7] = rng.randint(0, 256)
        out = decode_jpeg_gray(encode_jpeg_gray(img))
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 16


def test_jpeg_png_cross_codec_hash_parity():
    """The SAME flat-block pixels hash identically through the JPEG
    (lossy-but-exact-here) and PNG (lossless) pipelines."""
    from tubes_spark.operators.multimodal import encode_png, png_ahash_hex

    rng = np.random.RandomState(3)
    for _ in range(5):
        g = rng.randint(0, 256, (1, 8))
        gray = np.kron(g, np.ones((8, 8), int)).astype(np.uint8)
        rgb = np.repeat(gray[..., None], 3, axis=2)
        assert jpeg_ahash_hex(encode_jpeg_gray(gray)) == png_ahash_hex(
            encode_png(rgb)
        )


def test_running_fold_vectorized_op_matches_step_loop(spark, tmpdir):
    """op='sum' (per-batch C reduce + scalar merge) must equal the
    per-row step loop on integer-valued floats — the associativity
    contract the oracle query folds under."""
    from tubes_spark.streaming.state import running_fold

    schema = "user_id long, v double"
    rows = [(i % 5, float((i * 37) % 1000)) for i in range(200)]
    spark.createDataFrame(rows, schema).repartition(4).write.parquet(f"{tmpdir}/in")

    def drain(tag, **kw):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{tmpdir}/in")
        )
        folded = running_fold(stream, ["user_id"], "v", **kw)
        seen: list = []
        q = (
            folded.writeStream.foreachBatch(
                lambda bdf, _bid: seen.extend(bdf.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", f"{tmpdir}/ck_{tag}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        final = {}
        for r in seen:
            if int(r["n"]) >= final.get(r["key"], (0, 0))[1]:
                final[r["key"]] = (r["acc"], int(r["n"]))
        return final

    assert drain("vec", op="sum") == drain("loop")
    with pytest.raises(ValueError):
        running_fold(spark.readStream.schema(schema).parquet(f"{tmpdir}/in"),
                     ["user_id"], "v", op="median")


def test_space_saving_stream_state_survives_restart(spark, tmpdir):
    """The sketch lives in the state store: drain two slices, stop, add
    a third, restart from the same checkpoint — counts must continue
    (n_seen accumulates; an exact-regime key's est equals its full
    count), proving the summary rehydrates rather than restarts."""
    from pyspark.sql import functions as F

    from tubes_spark.operators.sketch import space_saving_stream

    schema = "tok string, bucket int"

    def write_slice(rows):
        spark.createDataFrame(rows, schema).repartition(1).write.mode(
            "append"
        ).parquet(f"{tmpdir}/in")

    def drain():
        seen: list = []
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{tmpdir}/in")
        )
        sk = space_saving_stream(stream, "tok", "bucket", capacity=8)
        q = (
            sk.writeStream.foreachBatch(
                lambda bdf, _bid: seen.extend(bdf.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", f"{tmpdir}/ck")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return seen

    write_slice([("a", 0)] * 5 + [("b", 0)] * 2)
    write_slice([("a", 0)] * 3 + [("c", 0)])
    drain()
    write_slice([("a", 0)] * 4 + [("b", 0)] * 6)
    seen = drain()  # restart from checkpoint: only the new slice replays
    final = {r.tok: (r.est, r.n_seen) for r in seen if r.n_seen == 21}
    # exact regime (3 distinct keys < capacity 8): est == true count,
    # and n_seen carries across the restart (11 pre + 10 post)
    assert final["a"] == (12, 21)
    assert final["b"] == (8, 21)
    assert final["c"] == (1, 21)
