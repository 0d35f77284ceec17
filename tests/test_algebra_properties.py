"""Algebraic law property tests (SURVEY.md §5 item 3): the laws the
reference inherits from typeclass instances, checked over random small
inputs via hypothesis.  Laws: functor composition, cat identity, (><)
associativity, concat monoid, merge multiset-equality, divide/choose
partition laws."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tubes_spark.pipe import Pipe, cat, pfilter, pmap
from tubes_spark.sink import Sink
from tubes_spark.source import Source

ints = st.lists(st.integers(min_value=-1000, max_value=1000), min_size=0, max_size=12)

SETTINGS = dict(
    max_examples=8,  # each example spins Spark jobs — keep the fleet small
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def seq_vals(src):
    return [r["value"] for r in src.ordered().collect()]


@settings(**SETTINGS)
@given(xs=ints)
def test_functor_composition(spark, xs):
    """map f . map g == map (f . g)  (RULES map fusion, Tubes/Util.hs:86-91)."""
    src = Source.each(spark, xs)
    f = lambda c: c * 2
    g = lambda c: c + 3
    lhs = src.map(g(F.col("value")).alias("value")).map(f(F.col("value")).alias("value"))
    rhs = src.map(f(g(F.col("value"))).alias("value"))
    assert seq_vals(lhs) == seq_vals(rhs)


@settings(**SETTINGS)
@given(xs=ints)
def test_cat_identity(spark, xs):
    """cat >< t == t == t >< cat  (Tubes/Util.hs:71-74)."""
    df = Source.each(spark, xs).data
    double = pmap((F.col("value") * 2).alias("value"))
    assert (cat >> double)(df).collect() == double(df).collect()
    assert (double >> cat)(df).collect() == double(df).collect()


@settings(**SETTINGS)
@given(xs=ints)
def test_compose_associativity(spark, xs):
    """(f >< g) >< h == f >< (g >< h)  (Tubes/Core.hs:140-150)."""
    df = Source.each(spark, xs).data
    f = pmap((F.col("value") + 1).alias("value"))
    g = pfilter(F.col("value") % 2 == 0)
    h = pmap((F.col("value") * 10).alias("value"))
    lhs = ((f >> g) >> h)(df).collect()
    rhs = (f >> (g >> h))(df).collect()
    assert lhs == rhs


@settings(**SETTINGS)
@given(xs=ints, ys=ints, zs=ints)
def test_concat_monoid(spark, xs, ys, zs):
    """<|> associativity + empty identity (Tubes/Source.hs:121-126)."""
    a, b, c = (Source.each(spark, v) for v in (xs, ys, zs))
    assert seq_vals((a | b) | c) == xs + ys + zs
    assert seq_vals(a | c) == xs + zs
    e = Source.empty(spark, "value bigint")
    assert seq_vals(e | a) == xs  # left identity


@settings(**SETTINGS)
@given(xs=ints, ys=ints)
def test_merge_multiset_and_interleave(spark, xs, ys):
    """merge: multiset == union; order == round-robin with survivor tail
    (Tubes/Source.hs:50-72,180-193)."""
    a, b = Source.each(spark, xs), Source.each(spark, ys)
    got = seq_vals(a.merge(b))
    expect = []
    for i in range(max(len(xs), len(ys))):
        if i < len(xs):
            expect.append(xs[i])
        if i < len(ys):
            expect.append(ys[i])
    assert got == expect
    assert sorted(got) == sorted(xs + ys)


@settings(**SETTINGS)
@given(xs=ints)
def test_choose_partitions(spark, xs):
    """choose: every element lands in exactly one sink; union is the
    input (Tubes/Sink.hs:112-116)."""
    t, f = [], []
    s = Sink.choose(F.col("value") >= 0, Sink.memory(t), Sink.memory(f))
    s(Source.each(spark, xs).data)
    assert sorted(r["value"] for r in t + f) == sorted(xs)
    assert all(r["value"] >= 0 for r in t)
    assert all(r["value"] < 0 for r in f)


@settings(**SETTINGS)
@given(xs=ints)
def test_broadcast_semigroup(spark, xs):
    """<> duplicates every element to both sinks (Tubes/Sink.hs:118-119)."""
    a, b = [], []
    (Sink.memory(a) + Sink.memory(b))(Source.each(spark, xs).data)
    assert sorted(r["value"] for r in a) == sorted(xs)
    assert sorted(r["value"] for r in b) == sorted(xs)


@settings(**SETTINGS)
@given(xs=st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=10),
       n=st.integers(min_value=0, max_value=12))
def test_take_drop_complement(spark, xs, n):
    """take n ++ drop n == id  (Tubes/Util.hs:94-120)."""
    src = Source.each(spark, xs)
    assert seq_vals(src.take(n)) + seq_vals(src.drop(n)) == xs
