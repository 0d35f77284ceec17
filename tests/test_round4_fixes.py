"""Round-4 fixes, each pinned by a regression test:

* ``Sink.choose`` total routing — NULL-predicate rows must reach exactly
  one sink (the reference's ``choose`` is ``a -> Either b c``,
  Tubes/Sink.hs:112-116: no element vanishes).
* content-hash salting — ``skew.salted_fold_by`` must spread a hot key
  even when the input is a single partition (one parquet file).
* hash-ordered centroid samples — ``_hash_sample`` must not return the
  corpus head on a source-sorted table.
* stdlib media-header parsing — PNG/JPEG/GIF dims + WAV duration from
  hand-built payloads, no codec libraries.
* events loader — ``ts`` must load as TIMESTAMP (not TIMESTAMP_NTZ, the
  round-3 ``tumbling_hourly`` regression) straight off the scan.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tubes_spark.operators import skew
from tubes_spark.operators.multimodal import decode_headers, parse_media_header
from tubes_spark.operators.similarity import _hash_sample
from tubes_spark.sink import Sink

SF_SMALL = "/root/testdata/sf0.001"


# --------------------------------------------------------------- Sink.choose

def test_sink_choose_routes_null_rows(spark):
    df = spark.createDataFrame(
        [Row(k=1, flag=True), Row(k=2, flag=False), Row(k=3, flag=None), Row(k=4, flag=True)]
    )
    got_true, got_false = [], []
    s = Sink.choose(F.col("flag"), Sink.memory(got_true), Sink.memory(got_false))
    s(df)
    assert sorted(r.k for r in got_true) == [1, 4]
    # NULL-predicate row 3 routes to on_false — not dropped
    assert sorted(r.k for r in got_false) == [2, 3]
    assert len(got_true) + len(got_false) == df.count()


# --------------------------------------------------------- content-hash salt

def test_salted_fold_single_partition_spreads(spark):
    # one partition, one hot key: the old spark_partition_id() % n salt
    # yields exactly ONE salt value here and the hot key funnels
    df = spark.range(0, 2000).coalesce(1).select(
        F.lit("hot").alias("k"), F.col("id").alias("x")
    )
    n_distinct = (
        df.select(skew._row_salt(8)).agg(F.countDistinct("__salt__").alias("n")).collect()[0].n
    )
    assert n_distinct == 8

    out = skew.salted_fold_by(
        df, ["k"], n_salts=8, total=(F.sum("x"), "sum"), n=(F.count(F.lit(1)), "count")
    ).collect()
    assert len(out) == 1
    assert out[0].total == sum(range(2000))
    assert out[0].n == 2000


def test_salted_broadcast_left_single_partition(spark):
    big = spark.range(0, 500).coalesce(1).select(
        (F.col("id") % 3).alias("j"), F.col("id").alias("x")
    )
    small = spark.createDataFrame([Row(j=0, tag="a"), Row(j=1, tag="b"), Row(j=2, tag="c")])
    out = skew.salted_broadcast_left(big, small, ["j"], n_salts=4)
    assert out.count() == 500  # no row lost or duplicated by salting
    assert out.filter(F.col("tag").isNull()).count() == 0


# ------------------------------------------------------- hash-ordered sample

def test_hash_sample_not_head_biased(spark):
    # source-sorted corpus: ids 0..999 in order, single partition; the
    # head-cap sample would be exactly {0..99}
    df = spark.range(0, 1000).coalesce(1).select(
        F.col("id").alias("vec_id"),
        F.array(F.col("id").cast("float"), (F.col("id") * 2).cast("float")).alias("embedding"),
    )
    pdf = _hash_sample(df, "embedding", 100)
    assert len(pdf) == 100
    sampled_firsts = sorted(v[0] for v in pdf["embedding"])
    head = [float(i) for i in range(100)]
    assert sampled_firsts != head  # spread across the id range
    assert max(sampled_firsts) > 500  # reaches the tail of the corpus
    # deterministic: same sample on re-run
    pdf2 = _hash_sample(df, "embedding", 100)
    assert sorted(v[0] for v in pdf2["embedding"]) == sampled_firsts


# ------------------------------------------------------- media header parsing

PNG_64x48 = (
    b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
    + (64).to_bytes(4, "big") + (48).to_bytes(4, "big") + b"\x08\x06\x00\x00\x00"
)
JPEG_32x16 = b"\xff\xd8\xff\xe0\x00\x04\x00\x00\xff\xc0\x00\x11\x08\x00\x10\x00\x20\x03"
GIF_7x5 = b"GIF89a" + (7).to_bytes(2, "little") + (5).to_bytes(2, "little") + b"\x00" * 4
WAV_2S = (
    b"RIFF" + (36 + 32000).to_bytes(4, "little") + b"WAVE"
    + b"fmt " + (16).to_bytes(4, "little")
    + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
    + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
    + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    + b"data" + (32000).to_bytes(4, "little")
)


@pytest.mark.parametrize(
    "payload,expect",
    [
        (PNG_64x48, ("image/png", 64, 48, None)),
        (JPEG_32x16, ("image/jpeg", 32, 16, None)),
        (GIF_7x5, ("image/gif", 7, 5, None)),
        (WAV_2S, ("audio/wav", None, None, 2000)),
        (b"plain text", ("application/octet-stream", None, None, None)),
        (b"", ("application/octet-stream", None, None, None)),
        (PNG_64x48[:10], ("application/octet-stream", None, None, None)),  # truncated
    ],
)
def test_parse_media_header(payload, expect):
    assert parse_media_header(payload) == expect


def test_decode_headers_dataframe(spark):
    df = spark.createDataFrame(
        [Row(media_id="png", content=bytearray(PNG_64x48)),
         Row(media_id="wav", content=bytearray(WAV_2S)),
         Row(media_id="junk", content=bytearray(b"xx")),
         Row(media_id="null", content=None)],
        schema="media_id string, content binary",
    )
    rows = {r.media_id: r for r in decode_headers(df).collect()}
    assert rows["png"].mime == "image/png" and rows["png"].width == 64
    assert rows["wav"].duration_ms == 2000
    assert rows["junk"].mime == "application/octet-stream"
    assert rows["null"].width is None


# ----------------------------------------------------------- events loader

def test_events_ts_loads_as_ltz_timestamp(spark):
    from tubes_spark.catalog import load_table

    e = load_table(spark, "events", SF_SMALL)
    assert dict(e.dtypes)["ts"] == "timestamp"
    # and it is scan-direct: no Project-with-cast between scan and consumer
    plan = e._jdf.queryExecution().executedPlan().toString()
    assert "precisetimestampconversion" not in plan.lower()


# ------------------------------------------------------ SpaceSaving sketch

def test_space_saving_eviction_bounds(spark):
    """Capacity 4 on a 12-key skewed stream forces real evictions; every
    reported key must satisfy true <= est <= true + err, and the two
    genuinely heavy keys must surface at the top."""
    from tubes_spark.operators.sketch import space_saving_topk

    rows = (["a"] * 100 + ["b"] * 50 + ["c"] * 8
            + [f"x{i}" for i in range(9)] * 2)
    df = spark.createDataFrame([(x,) for x in rows], "tok string").coalesce(1)
    got = {r.tok: (r.est_count, r.max_overcount)
           for r in space_saving_topk(df, "tok", k=4, capacity=4).collect()}
    true = {"a": 100, "b": 50, "c": 8, **{f"x{i}": 2 for i in range(9)}}
    for tok, (est, err) in got.items():
        assert true[tok] <= est <= true[tok] + err, (tok, est, err)
    top2 = sorted(got.items(), key=lambda it: -it[1][0])[:2]
    assert {t for t, _ in top2} == {"a", "b"}


def test_space_saving_exact_when_capacity_suffices(spark):
    """With capacity >= distinct keys per task the sketch IS the exact
    count (err 0) — the condition the oracle-gated query relies on."""
    from tubes_spark.operators.sketch import space_saving_topk

    rows = ["a"] * 5 + ["b"] * 3 + ["c"] * 2
    df = spark.createDataFrame([(x,) for x in rows], "tok string").repartition(4)
    got = [(r.tok, r.est_count, r.max_overcount)
           for r in space_saving_topk(df, "tok", k=3, capacity=16).collect()]
    assert got == [("a", 5, 0), ("b", 3, 0), ("c", 2, 0)]


# ----------------------------------------------------------------- EWMA

def test_ewma_matches_pandas_reference(spark):
    """The distributed per-user EWMA must agree with pandas' reference
    ewm(alpha, adjust=False).mean() computed per user on the driver.
    Tolerance 1e-6: the engine computes the explicit a*x + (1-a)*y
    recurrence (bit-matched by the DuckDB oracle), while pandas' ewm
    internally divides by (w + a) — a version-dependent ulp apart."""
    import pandas as pd

    from tubes_spark import queries as Q
    from tubes_spark.catalog import load_table

    got = {
        r.event_id: r.ewma_value
        for r in Q.ewma_user_values(spark, SF_SMALL).collect()
    }
    e = load_table(spark, "events", SF_SMALL).select(
        "user_id", "event_id", "ts", "value"
    ).toPandas()
    for _uid, grp in e.groupby("user_id"):
        grp = grp.sort_values(["ts", "event_id"])
        ref = grp["value"].ewm(alpha=0.3, adjust=False).mean().round(6)
        for eid, val in zip(grp["event_id"], ref):
            assert abs(got[eid] - val) <= 1e-6, (eid, got[eid], val)
