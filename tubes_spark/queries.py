"""The engine's query battery: one entry per operator family from
SURVEY.md §2 plus the north-star extensions (§2.8/§7.2-M4).

Every function takes ``(spark, sf_dir)`` and returns a DataFrame; the
matching DuckDB oracle SQL lives in ORACLES (same result columns, same
aliases — the driver hash-compares order-insensitively).

Float discipline (drives every alias below):
* per-row IEEE arithmetic (+,-,*,/, sqrt) is bit-identical across
  engines -> emit raw;
* SUM/running-SUM goes through DECIMAL(27,6) (exact, order-independent)
  then one cast to double -> bit-identical;
* transcendentals (exp/ln/sin/pow) may differ by ulps across libms ->
  round(...,6) with operands O(1);
* epoch seconds are emitted as BIGINT via floor() to avoid tz/rounding
  drift in timestamp rendering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tubes_spark.catalog import load_table
from tubes_spark.operators import dedup, joins, similarity, text, windows
from tubes_spark.operators.fold import fold_by, running_by
from tubes_spark.source import Source


def dsum(c: Column) -> Column:
    """Exact, order-independent sum: decimal accumulate, one double cast."""
    return F.sum(c.cast("decimal(27,6)")).cast("double")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


def LI_SEQ() -> Column:
    """Unique lineitem position: l_linenumber <= 7 so *8 is injective."""
    return F.col("l_orderkey") * 8 + F.col("l_linenumber")


# --------------------------------------------------------------------------
# Core stateless family (SURVEY §2.3) + folds (§2.2)
# --------------------------------------------------------------------------

def flagship_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: filter -> map -> grouped fold.  Exercises the
    reference pipeline `each >< filter >< map >< reduce` (Tubes/Core.hs:136,
    Tubes/Source.hs:167-174) generalized to grouped aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    out = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn("avg_qty", F.col("sum_qty") / F.col("count_order"))
        .withColumn("avg_price", F.col("sum_base_price") / F.col("count_order"))
    )
    return out


def map_net_price(spark, sf_dir):
    """`map` (Tubes/Util.hs:83-84): pure per-element transform."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
    )


def filter_pushdown(spark, sf_dir):
    """`filter` (Tubes/Util.hs:100-101); predicate reaches the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_quantity") >= 45) & (F.col("l_discount") <= 0.02)).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount"
    )


def take_ordered(spark, sf_dir):
    """`take` (Tubes/Util.hs:116-120) w.r.t. the explicit seq order
    (o_orderkey is unique, so the cut point is deterministic)."""
    o = _t(spark, sf_dir, "orders")
    src = Source.from_df_keyed(o.select("o_orderkey", "o_totalprice"), F.col("o_orderkey"))
    return src.take(500).data


def drop_skip(spark, sf_dir):
    """`drop` (Tubes/Util.hs:94-96): discard the first 1000 by seq."""
    o = _t(spark, sf_dir, "orders")
    src = Source.from_df_keyed(o.select("o_orderkey", "o_totalprice"), F.col("o_orderkey"))
    return src.drop(1000).data


def takewhile_error(spark, sf_dir):
    """`takeWhile` (Tubes/Util.hs:104-113): the whole stream terminates
    at the first violation.  The predicate violates mid-stream (id 4999)
    so the cut machinery is exercised at every sf; at sf0.001 (<5000
    events) it never violates, exercising the no-cut branch too."""
    e = _t(spark, sf_dir, "events")
    src = Source.from_df_keyed(e.select("event_id", "event_type", "value"), F.col("event_id"))
    return src.take_while((F.col("event_id") % 5000) != 4999).data


def concat_ordered(spark, sf_dir):
    """`<|>` ordered concat (Tubes/Source.hs:99-126)."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice", "o_orderpriority")
    a = Source.from_df_keyed(o.filter(F.col("o_orderpriority") == "1-URGENT"), F.col("o_orderkey"))
    b = Source.from_df_keyed(o.filter(F.col("o_orderpriority") == "5-LOW"), F.col("o_orderkey"))
    return (a | b).data.select("o_orderkey", "o_totalprice")


def merge_interleave(spark, sf_dir):
    """`merge` round-robin (Tubes/Source.hs:180-193); multiset equals union."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    a = Source.from_df_keyed(o.filter(F.col("o_totalprice") >= 100000), F.col("o_orderkey"))
    b = Source.from_df_keyed(o.filter(F.col("o_totalprice") < 100000), F.col("o_orderkey"))
    return a.merge(b).data


def cartesian_ap(spark, sf_dir):
    """Applicative `<*>` = cartesian (Tubes/Source.hs:89-92)."""
    r = Source.from_df_keyed(_t(spark, sf_dir, "region").select(F.col("r_name").alias("v")),
                             F.xxhash64("v"))
    n = Source.from_df_keyed(_t(spark, sf_dir, "nation").select(F.col("n_name").alias("v")),
                             F.xxhash64("v"))
    return r.ap(n, lambda a, b: F.concat_ws("_", a, b), alias="pair").data


def flatmap_words(spark, sf_dir):
    """Monadic bind / `for` flatMap (Tubes/Source.hs:94-97, Tubes/Util.hs:46-57)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.explode(F.split(text.normalize(F.col("text")), " ")).alias("word")
    )


def numeric_source_math(spark, sf_dir):
    """Num/Floating instances (Tubes/Source.hs:128-162): lifted math."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sqrt("l_quantity").alias("sqrt_qty"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.round(F.log(F.lit(1.0) + F.col("l_discount")), 6).alias("ln1p_disc"),
        F.round(F.sin("l_quantity"), 6).alias("sin_qty"),
        F.abs(-F.col("l_tax")).alias("abs_tax"),
    )


def fold_global(spark, sf_dir):
    """`reduce` whole-stream strict fold (Tubes/Source.hs:167-174)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("l_quantity")).alias("total_qty"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )


def running_user_sum(spark, sf_dir):
    """Stateful running accumulator (Tubes/Channel.hs:46-76), keyed for
    scale: per-user prefix sum in event order."""
    e = _t(spark, sf_dir, "events")
    out = running_by(
        e.select("event_id", "user_id", "value"),
        ["user_id"],
        "event_id",
        run_sum=F.sum(F.col("value").cast("decimal(27,6)")),
    )
    return out.select("event_id", "user_id", F.col("run_sum").cast("double").alias("run_sum"))


def running_user_avg(spark, sf_dir):
    """The reference's running-average demo (Tubes/Channel.hs:36-77)."""
    e = _t(spark, sf_dir, "events")
    out = running_by(
        e.select("event_id", "user_id", "value"),
        ["user_id"],
        "event_id",
        s=F.sum(F.col("value").cast("decimal(27,6)")),
        n=F.count(F.lit(1)),
    )
    return out.select(
        "event_id",
        "user_id",
        (F.col("s").cast("double") / F.col("n")).alias("run_avg"),
    )


def mapm_pandas_upper(spark, sf_dir):
    """`mapM` effectful per-element transform (Tubes/Util.hs:147-150) —
    the Arrow-batched python escape hatch (never row-at-a-time)."""
    import pandas as pd

    d = _t(spark, sf_dir, "documents").select("doc_id", F.substring("text", 1, 30).alias("head"))

    def up(batches):
        for pdf in batches:
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "head": pdf["head"].str.upper()})

    return d.mapInPandas(up, schema="doc_id long, head string")


def each_literal_map(spark, sf_dir):
    """README flagship: `each [1..10] >< map (*2)` (Tubes/Core.hs:136-138)."""
    return Source.each(spark, range(1, 11)).map((F.col("value") * 2).alias("value")).data


def every_nullable(spark, sf_dir):
    """`every` (Tubes/Util.hs:79-80): Maybe-stream with terminal Nothing."""
    return Source.every(spark, [1, 2, 3, 4, 5]).data


# --------------------------------------------------------------------------
# Joins (north-star; reference has none — SURVEY §2.8)
# --------------------------------------------------------------------------

def join_broadcast_parts(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = joins.broadcast_join(li, p, on=F.col("l_partkey") == F.col("p_partkey"))
    return fold_by(
        j, ["p_brand"],
        F.count(F.lit(1)).alias("n_items"),
        dsum(F.col("l_quantity")).alias("sum_qty"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


def q3_shipping_priority(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp"))
    j = (
        joins.broadcast_join(o, c, on=F.col("o_custkey") == F.col("c_custkey"))
        .join(li, on=F.col("l_orderkey") == F.col("o_orderkey"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(rev).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q5_nation_revenue(spark, sf_dir):
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    j = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, (F.col("o_custkey") == F.col("c_custkey")) & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.groupBy("n_name").agg(dsum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_items"))


def asof_purchase(spark, sf_dir):
    """As-of join: each view event gets the user's most recent purchase
    value at-or-before it (union/window impl — one shuffle, no UDF)."""
    e = _t(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts", "value")
    right = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts", "value")
    out = joins.asof_join(
        left, right, on_time="ts", by=["user_id"], right_cols=["value"],
        suffix="_last_purchase", tiebreak="event_id",
    )
    return out.select(
        "event_id", "user_id", "value", F.col("value_last_purchase").alias("last_purchase_value")
    )


def latest_event_per_user(spark, sf_dir):
    """argmax-per-key (deterministic tiebreak by event_id)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "value")
    )


def topn_orders_per_customer(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# --------------------------------------------------------------------------
# Event-time windows (north-star)
# --------------------------------------------------------------------------

def tumbling_hourly(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    out = windows.tumbling(
        e, "ts", "1 hour", [],
        F.count(F.lit(1)).alias("window_count"),
        dsum(F.col("value")).alias("window_sum"),
    )
    return out.select(
        F.col("win.start").cast("long").alias("window_start"), "window_count", "window_sum"
    )


def sliding_10m(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    out = windows.sliding(
        e, "ts", "10 minutes", "5 minutes", [],
        F.count(F.lit(1)).alias("window_count"),
        dsum(F.col("value")).alias("window_sum"),
    )
    return out.select(
        F.col("win.start").cast("long").alias("window_start"), "window_count", "window_sum"
    )


def session_30m(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    out = windows.session(
        e, "ts", "30 minutes", ["user_id"],
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value")).alias("sum_value"),
    )
    return out.select(
        "user_id",
        F.col("win.start").cast("long").alias("session_start"),
        F.col("win.end").cast("long").alias("session_end"),
        "n_events",
        "sum_value",
    )


# --------------------------------------------------------------------------
# Set ops / distinct / pivot / rollup
# --------------------------------------------------------------------------

def distinct_segments(spark, sf_dir):
    return _t(spark, sf_dir, "customer").select("c_mktsegment").distinct()


def topk_orders(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


def customers_without_orders(spark, sf_dir):
    """EXCEPT as scalable anti-join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select("c_custkey")


def customers_with_orders(spark, sf_dir):
    """INTERSECT as semi-join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select("c_custkey")


def pivot_event_counts(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    return (
        e.groupBy("user_id").pivot("event_type", kinds).count().na.fill(0, kinds)
    )


def rollup_flag_status(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum(F.col("l_quantity")).alias("sum_qty")
    )


def json_extract_props(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.select(F.get_json_object("props", "$.k").cast("int").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# Routing / sink algebra expressed as queries (SURVEY §2.5)
# --------------------------------------------------------------------------

def route_choose_counts(spark, sf_dir):
    """Decidable.choose (Tubes/Sink.hs:112-116): predicate routing."""
    e = _t(spark, sf_dir, "events")
    branch = F.when(F.col("value") >= 50, F.lit("hi")).otherwise(F.lit("lo"))
    return e.groupBy(branch.alias("branch")).agg(
        F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("sum_value")
    )


def divide_parts(spark, sf_dir):
    """Divisible.divide (Tubes/Sink.hs:101-105): split each element into
    two parts feeding two sinks (modeled as a tagged union)."""
    e = _t(spark, sf_dir, "events")
    t = e.select(F.lit("time").alias("part"), "event_id",
                 F.col("ts").cast("long").cast("double").alias("payload"))
    v = e.select(F.lit("value").alias("part"), "event_id", F.col("value").alias("payload"))
    return t.unionByName(v)


# --------------------------------------------------------------------------
# Text analysis (north-star)
# --------------------------------------------------------------------------

def text_token_counts(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", text.token_count(F.col("text")).alias("n_tokens"),
                    text.word_count(F.col("text")).alias("n_words"))


def text_quality(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", text.quality_score(F.col("text")).alias("quality"))


def text_langid(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", text.lang_id(F.col("text")).alias("lang_pred"))


def text_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", text.fingerprint_md5(F.col("text")).alias("fp"))


# --------------------------------------------------------------------------
# Dedup (north-star)
# --------------------------------------------------------------------------

def dedup_exact_docs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return dedup.dedup_exact(d)


def jaccard_near_dup_pairs(spark, sf_dir):
    """Exact shingle-Jaccard >= 0.5 pairs with provably-lossless size-band
    blocking (J>=0.5 implies |A|,|B| within 2x).  Production path for the
    same result at scale: minhash_candidates + this verify step."""
    d = _t(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        F.array_distinct(text.word_shingles(F.col("text"), 3)).alias("sh"),
    ).withColumn("n", F.size("sh"))
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"), F.col("n").alias("na"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"), F.col("n").alias("nb"))
    pairs = a.join(
        b,
        (F.col("id_a") < F.col("id_b")) & (F.col("na") <= 2 * F.col("nb")) & (F.col("nb") <= 2 * F.col("na")),
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return pairs.select("id_a", "id_b", jac.alias("jaccard")).filter(F.col("jaccard") >= 0.5)


def dedup_minhash_survivors(spark, sf_dir):
    """MinHash-LSH near-dedup (rows-only check: xxhash64 signatures are
    not reproducible in the SQL oracle)."""
    d = _t(spark, sf_dir, "documents")
    return dedup.dedup_minhash(d, threshold=0.8).select("doc_id")


def dedup_simhash_survivors(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return dedup.dedup_simhash(d, bits=32).select("doc_id")


# --------------------------------------------------------------------------
# Similarity search (north-star)
# --------------------------------------------------------------------------

def knn_bruteforce(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    return similarity.knn_bruteforce(emb, q, k=10).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )


def knn_lsh_approx(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    return similarity.knn_lsh(emb, q, dim=64, k=10, n_planes=4).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )


def embedding_dedup_survivors(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.embedding_dedup(emb, threshold=0.98, dim=64).select("vec_id")
