"""Regression tests pinning the round-2 review (ADVICE.md r1) fixes:

* pswitch/pchoice must not silently drop rows whose routing column /
  predicate is NULL (three-valued `~matched` used to eat them).
* merge interleave order must hold for NON-dense seqs (filtered or
  keyed sources), not just `each`-style 0..n-1 seqs.
* flat_map / ap seq packing must use a data-derived stride (no 2^20
  collisions) and raise on overflow instead of corrupting the order.
* multi-branch combinators must not leak persisted partitions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tubes_spark.pipe import Pipe, cat, pchoice, pmap, pswitch
from tubes_spark.source import SEQ, Source


def _vals(src: Source, col: str = "value") -> list:
    return [r[col] for r in src.ordered().collect()]


# ---------------------------------------------------------------- routing NULLs

def test_pswitch_null_rows_reach_default(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "zz")], "id int, k string"
    )
    tag = lambda v: pmap(route=F.lit(v))  # noqa: E731
    out = pswitch(F.col("k"), {"a": tag("A"), "b": tag("B")}, default=tag("D"))(df)
    got = {r["id"]: r["route"] for r in out.collect()}
    # id=3 (NULL key) must reach the default branch, not vanish
    assert got == {1: "A", 2: "B", 3: "D", 4: "D"}


def test_pswitch_none_case_matches_null(spark):
    df = spark.createDataFrame([(1, "a"), (2, None)], "id int, k string")
    tag = lambda v: pmap(route=F.lit(v))  # noqa: E731
    out = pswitch(F.col("k"), {"a": tag("A"), None: tag("N")})(df)
    got = {r["id"]: r["route"] for r in out.collect()}
    assert got == {1: "A", 2: "N"}


def test_pchoice_null_pred_takes_false_branch(spark):
    df = spark.createDataFrame([(1, 10), (2, None), (3, 3)], "id int, x int")
    out = pchoice(F.col("x") > 5, pmap(b=F.lit("hi")), pmap(b=F.lit("lo")))(df)
    got = {r["id"]: r["b"] for r in out.collect()}
    # x=NULL: pred is NULL -> false branch, row is kept
    assert got == {1: "hi", 2: "lo", 3: "lo"}


# ------------------------------------------------------------- merge interleave

def test_merge_round_robin_holds_for_filtered_sources(spark):
    # filtered sources have non-dense seqs: survivors keep their original
    # positions.  merge must still produce A1 B1 A2 B2 ... by RANK.
    a = Source.each(spark, [f"a{i}" for i in range(6)]).filter(
        F.col("value").isin("a1", "a3", "a5")
    )
    b = Source.each(spark, [f"b{i}" for i in range(2)])
    got = _vals(a.merge(b))
    assert got == ["a1", "b0", "a3", "b1", "a5"]


def test_merge_keyed_hash_seqs_no_overflow(spark):
    # from_df_keyed with xxhash64 seqs used to overflow on seq*2; after
    # re-ranking the result is a clean interleave of both streams.
    df = spark.createDataFrame([(i, f"v{i}") for i in range(10)], "id long, value string")
    a = Source.from_df_keyed(df.filter("id % 2 = 0"), F.xxhash64(F.col("id")))
    b = Source.from_df_keyed(df.filter("id % 2 = 1"), F.xxhash64(F.col("id")))
    rows = a.merge(b).ordered().collect()
    assert len(rows) == 10
    # positions alternate sources while both sides last (hash order within
    # each side is arbitrary but the round-robin structure is fixed)
    parities = ["even" if int(r["value"][1:]) % 2 == 0 else "odd" for r in rows]
    assert parities == ["even", "odd"] * 5


# ----------------------------------------------------------- flat_map/ap packing

def test_flatmap_stride_exceeds_old_fixed_width(spark):
    # two docs, inner arrays longer than nothing special — but force the
    # stride logic by checking exact (outer, inner) lexicographic order
    src = Source.each(spark, [3, 1], column="n")
    out = src.flat_map(F.sequence(F.lit(1), F.col("n")), "v")
    assert _vals(out, "v") == [1, 2, 3, 1]


def test_flatmap_overflow_raises_not_corrupts(spark):
    # hash-derived outer seq near 2^63: packing must raise (assert_true),
    # never silently wrap into wrong order
    df = spark.createDataFrame([(1,)], "id long")
    src = Source.from_df_keyed(df, F.lit((1 << 62) + 7).cast("long"))
    out = src.flat_map(F.array(F.lit(1), F.lit(2), F.lit(3)), "v")
    with pytest.raises(Exception, match="(?i)packing overflow|ASSERT"):
        out.df.collect()


def test_ap_cartesian_order_with_nondense_seqs(spark):
    # left side keyed by a sparse monotone seq (id*1000) — packing must
    # still give nested-loop order: outer-by-seq, inner-by-rank
    ldf = spark.createDataFrame([(2, "y"), (1, "x")], "id long, value string")
    left = Source.from_df_keyed(ldf, F.col("id") * 1000).map(F.col("value"))
    right = Source.each(spark, ["1", "2", "3"])
    out = left.ap(right, lambda a, b: F.concat(a, b), alias="pair")
    assert _vals(out, "pair") == ["x1", "x2", "x3", "y1", "y2", "y3"]


# ------------------------------------------------------------------ cache leaks

def test_multibranch_combinators_leave_no_cached_plans(spark):
    spark.catalog.clearCache()
    df = spark.range(100).withColumn("k", (F.col("id") % 3).cast("int"))
    double = Pipe(lambda d: d.withColumn("x", F.col("id") * 2))
    out = pswitch(F.col("k"), {0: double, 1: cat}, default=double)(df)
    assert out.count() == 100
    out2 = pchoice(F.col("k") > 1, double, cat)(df)
    assert out2.count() == 100
    # DataFrame.persist registers in the CacheManager until an explicit
    # unpersist; the fixed combinators must not leave entries behind
    jcm = spark._jsparkSession.sharedState().cacheManager()
    assert jcm.isEmpty(), "multi-branch combinator leaked a CacheManager entry"
