"""The reference's worked doc examples as executable golden tests
(SURVEY.md §5 — the reference ships zero tests; its Haddock examples
are the informal spec).  Each cites the reference file:line."""

from pyspark.sql import functions as F

from tubes_spark.source import Source
from tubes_spark.sink import Sink, tee
from tubes_spark.pipe import Pipe, cat, pmap, pfilter
from tubes_spark.streaming.state import batch_resumable_fold


def vals(src, col="value"):
    return [r[col] for r in src.ordered().collect()]


def test_each_map_pipeline(spark):
    """runTube $ each [1..10] >< map (*2) — Tubes/Core.hs:136-138."""
    out = Source.each(spark, range(1, 11)).map((F.col("value") * 2).alias("value"))
    assert vals(out) == [2, 4, 6, 8, 10, 12, 14, 16, 18, 20]


def test_merge_interleave_order(spark):
    """merge with uneven sources -> A1 B1 A2 B2 A3 B3 B4
    (Tubes/Source.hs:50-72)."""
    a = Source.each(spark, ["A1", "A2", "A3"])
    b = Source.each(spark, ["B1", "B2", "B3", "B4"])
    assert vals(a.merge(b)) == ["A1", "B1", "A2", "B2", "A3", "B3", "B4"]


def test_merge_dense_skips_rerank_window(spark):
    """Dense (each-style) sources merge WITHOUT the re-rank window — no
    single-partition funnel in the plan; a filtered (non-dense) side
    still gets re-ranked, and both produce the reference interleave."""
    a = Source.each(spark, ["A1", "A2", "A3"])
    b = Source.each(spark, ["B1", "B2", "B3", "B4"])
    assert a.dense and b.dense
    assert "Window" not in a.merge(b).df._jdf.queryExecution().toString()
    # filtered side loses density -> re-rank window appears, order still right
    fa = a.filter(F.col("value") != "A2")
    assert not fa.dense
    assert "Window" in fa.merge(b).df._jdf.queryExecution().toString()
    assert vals(fa.merge(b)) == ["A1", "B1", "A3", "B2", "B3", "B4"]


def test_concat_drains_first_fully(spark):
    """<|> ordered concatenation — Tubes/Source.hs:99-126."""
    a = Source.each(spark, [1, 2, 3])
    b = Source.each(spark, [4, 5])
    assert vals(a | b) == [1, 2, 3, 4, 5]


def test_contramap_summing_sink(spark):
    """(*2) >$< sum-sink: 1..5 summed after doubling = 30
    (Tubes/Sink.hs:38-62: 15 plain, 30 contramapped)."""
    src = Source.each(spark, [1, 2, 3, 4, 5])
    got = []
    plain = Sink.memory(got).contramap(lambda df: df.agg(F.sum("value").alias("value")))
    plain(src.data)
    assert got[0]["value"] == 15
    got2 = []
    doubled = Sink.memory(got2).contramap(
        lambda df: df.select((F.col("value") * 2).alias("value")).agg(F.sum("value").alias("value"))
    )
    doubled(src.data)
    assert got2[0]["value"] == 30


def test_sink_broadcast_both_receive(spark):
    """Sink <> duplicates every element to both sinks
    (Tubes/Sink.hs:64-91: two lines per element)."""
    a, b = [], []
    both = Sink.memory(a) + Sink.memory(b)
    both(Source.each(spark, [1, 2, 3]).data)
    assert len(a) == 3 and len(b) == 3


def test_divide_splits_elements(spark):
    """divide: each element split into two parts, one per sink
    (Tubes/Sink.hs:101-105)."""
    left, right = [], []
    s = Sink.divide(
        lambda df: (df.select("value"), df.select((F.col("value") * 10).alias("tens"))),
        Sink.memory(left),
        Sink.memory(right),
    )
    s(Source.each(spark, [1, 2]).data)
    assert [r["value"] for r in left] == [1, 2] or sorted(r["value"] for r in left) == [1, 2]
    assert sorted(r["tens"] for r in right) == [10, 20]


def test_choose_routes_by_predicate(spark):
    """Decidable.choose routing — Tubes/Sink.hs:112-116."""
    evens, odds = [], []
    s = Sink.choose(F.col("value") % 2 == 0, Sink.memory(evens), Sink.memory(odds))
    s(Source.each(spark, [1, 2, 3, 4, 5]).data)
    assert sorted(r["value"] for r in evens) == [2, 4]
    assert sorted(r["value"] for r in odds) == [1, 3, 5]


def test_running_average(spark):
    """Arrow running-average demo: 0,10,7,8 -> 0.0, 5.0, 5.666…, 6.25
    (Tubes/Channel.hs:36-77)."""
    src = Source.each(spark, [0.0, 10.0, 7.0, 8.0])
    out = src.running(s=F.sum("value"), n=F.count(F.lit(1)))
    rows = out.df.orderBy("__seq__").select((F.col("s") / F.col("n")).alias("avg")).collect()
    avgs = [round(r["avg"], 4) for r in rows]
    assert avgs == [0.0, 5.0, 5.6667, 6.25]


def test_resumable_fold(spark):
    """lfold resumption: sum 1..10 = 55, resume with 11..20 -> 210
    (Tubes/Util.hs:158-172)."""
    total, resume = batch_resumable_fold(range(1, 11), lambda a, v: a + v, 0.0)
    assert total == 55
    total2, _ = resume(range(11, 21))
    assert total2 == 210


def test_tee_observes_and_forwards(spark):
    """tee: side-feed a sink, forward unchanged — Tubes/Channel.hs:199-206."""
    seen = []
    stage = tee(Sink.memory(seen))
    out = stage(Source.each(spark, [1, 2, 3]).data)
    assert sorted(r["value"] for r in out.collect()) == [1, 2, 3]
    assert len(seen) == 3


def test_take_drop_takewhile_order(spark):
    src = Source.each(spark, [5, 3, 8, 1, 9, 2])
    assert vals(src.take(3)) == [5, 3, 8]          # positional, not sorted
    assert vals(src.drop(4)) == [9, 2]
    assert vals(src.take_while(F.col("value") != 1)) == [5, 3, 8]
    assert vals(src.drop_while(F.col("value") != 1)) == [1, 9, 2]


def test_every_ends_with_nothing(spark):
    out = vals(Source.every(spark, [1, 2]))
    assert out == [1, 2, None]


def test_cartesian_ap_order(spark):
    """Applicative <*> nests loops: left outer, right inner
    (Tubes/Source.hs:89-92)."""
    a = Source.each(spark, [1, 2])
    b = Source.each(spark, [10, 20])
    assert vals(a.ap(b, lambda x, y: x + y)) == [11, 21, 12, 22]


def test_flatmap_order(spark):
    src = Source.each(spark, [2, 3])
    out = src.flat_map(F.sequence(F.lit(1), F.col("value")), "n")
    assert vals(out, "n") == [1, 2, 1, 2, 3]


def test_pipe_composition_and_cat(spark):
    """(><) composition + cat identity + RULES map-fusion equivalence
    (Tubes/Core.hs:140-150, Tubes/Util.hs:66-91)."""
    df = Source.each(spark, range(10)).data
    double = pmap((F.col("value") * 2).alias("value"))
    inc = pmap((F.col("value") + 1).alias("value"))
    fused = pmap(((F.col("value") * 2) + 1).alias("value"))
    p1 = (double >> inc)(df).collect()
    p2 = fused(df).collect()
    assert [r["value"] for r in p1] == [r["value"] for r in p2]
    assert (cat >> double)(df).collect() == double(df).collect()
    assert (double >> cat)(df).collect() == double(df).collect()


def test_pipe_rrshift_sugar(spark):
    df = Source.each(spark, [1, 2, 3]).data
    out = df >> pfilter(F.col("value") > 1) >> pmap((F.col("value") * 100).alias("value"))
    assert sorted(r["value"] for r in out.collect()) == [200, 300]


def test_fanout_applicative(spark):
    """Channel Applicative: run two stages on the same element, combine
    (Tubes/Channel.hs:97-99)."""
    from tubes_spark.pipe import fanout

    df = Source.each(spark, [1, 2, 3]).data.withColumn("k", F.col("value"))
    doubled = pmap("k", (F.col("value") * 2).alias("d"))
    squared = pmap("k", (F.col("value") * F.col("value")).alias("sq"))
    out = fanout(doubled, squared, key="k")(df)
    got = {(r["d"], r["sq"]) for r in out.collect()}
    assert got == {(2, 1), (4, 4), (6, 9)}


def test_pfirst_transforms_one_component(spark):
    """Arrow.first: stage applied to one pair component, other rides
    through (Tubes/Channel.hs:122-132)."""
    from tubes_spark.pipe import pfirst

    rows = [(1, 10, "a"), (2, 20, "b")]
    df = spark.createDataFrame(rows, "k int, x int, tag string")
    stage = pmap("k", (F.col("x") + 1).alias("x"))
    out = pfirst(stage, key="k", comp=["x"])(df)
    got = {(r["k"], r["x"], r["tag"]) for r in out.collect()}
    assert got == {(1, 11, "a"), (2, 21, "b")}


def test_pchoice_independent_branch_state(spark):
    """ArrowChoice +++: each branch holds independent state — branch-local
    running sums must not see the other branch's rows
    (Tubes/Channel.hs:134-159)."""
    from pyspark.sql import Window
    from tubes_spark.pipe import pchoice

    df = Source.each(spark, [1, 2, 3, 4, 5, 6]).df  # keeps __seq__
    w = Window.orderBy("__seq__").rowsBetween(Window.unboundedPreceding, 0)
    runsum = Pipe(lambda d: d.withColumn("rs", F.sum("value").over(w)))
    out = pchoice(F.col("value") % 2 == 0, runsum, runsum)(df)
    got = {(r["value"], r["rs"]) for r in out.collect()}
    # evens: 2,6,12 ; odds: 1,4,9 — NOT the global prefix sums
    assert got == {(2, 2), (4, 6), (6, 12), (1, 1), (3, 4), (5, 9)}


def test_pswitch_finite_channel_monad(spark):
    """Channel Monad (relational subset): per-element stage choice by
    value (Tubes/Channel.hs:102-117)."""
    from tubes_spark.pipe import pswitch

    rows = [("a", 1), ("b", 2), ("c", 3), ("a", 4)]
    df = spark.createDataFrame(rows, "tag string, v int")
    out = pswitch(
        F.col("tag"),
        {"a": pmap("tag", (F.col("v") * 10).alias("v")),
         "b": pmap("tag", (F.col("v") * 100).alias("v"))},
        default=pmap("tag", F.col("v").alias("v")),
    )(df)
    got = sorted((r["tag"], r["v"]) for r in out.collect())
    assert got == [("a", 10), ("a", 40), ("b", 200), ("c", 3)]


def test_source_numeric_instances(spark):
    """Num/Floating instances (Tubes/Source.hs:128-162)."""
    a = Source.each(spark, [1.0, 4.0])
    b = Source.each(spark, [2.0])
    assert vals(a + b) == [3.0, 6.0]
    assert vals(a * b) == [2.0, 8.0]
    assert vals(a ** b) == [1.0, 16.0]
    assert vals(a.sqrt()) == [1.0, 2.0]
    assert vals(-a) == [-1.0, -4.0]
    assert vals(a.recip()) == [1.0, 0.25]
    assert vals(a.signum()) == [1.0, 1.0]


def test_source_floating_named_surface(spark):
    """Every named Floating member (Tubes/Source.hs:143-162) as a Source
    method, checked against python math."""
    import math

    xs = [0.0, 0.5]
    a = Source.each(spark, xs)

    def close(got, fn, inputs=xs):
        for g, x in zip(got, inputs):
            assert abs(g - fn(x)) < 1e-12, (g, x)

    close(vals(a.asin()), math.asin)
    close(vals(a.acos()), math.acos)
    close(vals(a.atan()), math.atan)
    close(vals(a.sinh()), math.sinh)
    close(vals(a.cosh()), math.cosh)
    close(vals(a.tanh()), math.tanh)
    close(vals(a.asinh()), math.asinh)
    close(vals(a.atanh()), math.atanh)
    close(vals(Source.each(spark, [1.0, 2.5]).acosh()), math.acosh, [1.0, 2.5])
    close(vals(Source.each(spark, [0.5, 8.0]).log_base(2.0)),
          lambda x: math.log(x, 2.0), [0.5, 8.0])
    assert vals(Source.pi(spark)) == [math.pi]


def test_pdynamic_channel_monad(spark):
    """Fully-dynamic Channel Monad escape hatch (Tubes/Channel.hs:
    102-117): a brand-new channel per element — element n yields n
    copies of n*10 (0 yields = per-element halt)."""
    from tubes_spark.pipe import pdynamic

    df = spark.createDataFrame([(0,), (1,), (2,), (3,)], "n int")

    def make_channel(row):
        for _ in range(row["n"]):
            yield {"out": row["n"] * 10}

    got = sorted(r["out"] for r in pdynamic(make_channel, "out long")(df).collect())
    assert got == [10, 20, 20, 30, 30, 30]
