"""Round-5 additions: custom DataSource offset protocol, arith-twin
plan shapes, and invariants not covered by the oracle-parity sweep."""

import re

from pyspark.sql import functions as F

import tubes_spark.queries as Q
from tubes_spark.catalog import load_table
from tubes_spark.operators import dedup
from tubes_spark.plans import n_nodes, plan_of

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# Custom Python DataSource: offset protocol (no Spark needed)
# --------------------------------------------------------------------------

def test_stream_reader_offset_protocol_partitions_cover_exactly():
    """partitions(start, end) must cover [start, end) exactly once, for
    any admitted range — the replayability contract a retried trigger
    relies on."""
    from tubes_spark.datasource import _ArithStreamReader

    r = _ArithStreamReader({"rows_per_batch": 70, "max_rows": 250, "n_parts": 4})
    assert r.initialOffset() == {"next": 0}
    seen = []
    prev = r.initialOffset()
    while True:
        cur = r.latestOffset()
        if cur["next"] == prev["next"]:
            break
        parts = r.partitions(prev, cur)
        rows = [i for p in parts for i in range(p.start, p.end)]
        assert rows == list(range(prev["next"], cur["next"]))
        seen.extend(rows)
        prev = cur
    assert seen == list(range(250))  # capped at max_rows, no gaps/dups


def test_stream_reader_replay_is_deterministic():
    """Re-reading the same offset range yields identical rows (retry
    safety)."""
    from tubes_spark.datasource import _ArithStreamReader

    r = _ArithStreamReader({"rows_per_batch": 100, "max_rows": 300})
    a = [list(r.read(p)) for p in r.partitions({"next": 40}, {"next": 160})]
    b = [list(r.read(p)) for p in r.partitions({"next": 40}, {"next": 160})]
    assert a == b


def test_batch_reader_partition_ranges_cover_n_rows():
    from tubes_spark.datasource import _ArithReader

    r = _ArithReader({"n_rows": 1003, "n_parts": 8})
    parts = r.partitions()
    rows = [i for p in parts for i in range(p.start, p.end)]
    assert rows == list(range(1003))


# --------------------------------------------------------------------------
# Plan shapes for the round-5 operators
# --------------------------------------------------------------------------

def test_arith_minhash_single_aggregation_shuffle(spark):
    """The 16 min-aggregates must partial-aggregate map-side: two
    HashAggregates around the one keyed Exchange, plus the explicit
    compute repartition — no extra shuffles sneak in."""
    d = load_table(spark, "documents", SF)
    banded = dedup.arith_minhash_bands(d)
    p = plan_of(banded)
    assert n_nodes(p, "HashAggregate") >= 2, p
    assert p.count("Exchange") <= 2, p


def test_rolling_range_frame_single_shuffle(spark):
    """One hashpartitioning(user_id) exchange, then a sorted running
    window — no global sort, no second exchange."""
    df = Q.rolling_1h_user_value(spark, SF)
    p = plan_of(df)
    assert n_nodes(p, "Exchange") == 1, p
    assert "hashpartitioning" in p and "user_id" in p, p
    assert "specifiedwindowframe(RangeFrame" in p, p


def test_stream_enrich_uses_broadcast(spark):
    """The static dimension must ride broadcast in the micro-batch plan;
    cheapest proxy: the equivalent batch plan broadcasts under the same
    session confs."""
    e = load_table(spark, "events", SF).select("event_id", "user_id")
    c = load_table(spark, "customer", SF).select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    p = plan_of(e.join(F.broadcast(c), on="user_id", how="left"))
    assert "BroadcastHashJoin" in p, p


# --------------------------------------------------------------------------
# Arith-twin semantics beyond the oracle sweep
# --------------------------------------------------------------------------

def test_arith_simhash_survivor_of_identical_texts_is_min_id(spark):
    """Two docs with identical canonical text get identical signatures;
    only the smaller id survives."""
    d = load_table(spark, "documents", SF)
    row = d.orderBy("doc_id").limit(1)
    dup = row.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    spark_df = d.unionByName(dup)

    import tubes_spark.queries as QQ
    import tempfile
    import shutil
    import os

    tmp = tempfile.mkdtemp(prefix="arith_simhash_")
    try:
        for t in ["documents"]:
            spark_df.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        for t in ["region", "nation", "customer", "supplier", "part", "orders",
                  "lineitem", "events", "embeddings"]:
            src = os.path.join(SF, t + ".parquet")
            dst = os.path.join(tmp, t + ".parquet")
            if os.path.isfile(src):
                shutil.copyfile(src, dst)
            else:
                shutil.copytree(src, dst)
        out = QQ.dedup_simhash_arith_survivors(spark, tmp)
        assert out.filter(F.col("doc_id") >= 1_000_000).count() == 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_winnow_arith_fingerprints_contained_in_gram_hashes(spark):
    """Selected fingerprints are window minima, so every fp must be one
    of the doc's gram hashes; count bounded by n_windows."""
    df = Q.text_winnow_arith_fingerprints(spark, SF)
    d = load_table(spark, "documents", SF)
    n_fp = df.groupBy("doc_id").count()
    lens = d.select(
        "doc_id",
        F.greatest(
            F.length(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))) - 7,
            F.lit(1),
        ).alias("n_grams"),
    )
    joined = n_fp.join(lens, "doc_id").filter(F.col("count") > F.col("n_grams"))
    assert joined.count() == 0


def test_morton_key_known_values_and_monotonicity(spark):
    """Interleave spot checks (a=3,b=1 -> 0b111) and per-argument
    monotonicity at fixed other argument."""
    from tubes_spark.sources import morton_key

    df = spark.createDataFrame(
        [(3, 1), (0, 0), (65535, 65535), (1, 0), (0, 1)], "a long, b long"
    )
    out = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", morton_key(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }
    assert out[(3, 1)] == 0b111
    assert out[(0, 0)] == 0
    assert out[(1, 0)] == 1 and out[(0, 1)] == 2
    assert out[(65535, 65535)] == (1 << 32) - 1
    rows = spark.range(100).select(
        morton_key(F.col("id"), F.lit(7)).alias("z")
    ).collect()
    zs = [r["z"] for r in rows]
    assert zs == sorted(zs)


def test_bpe_train_matches_pure_python_reference(spark):
    """The distributed BPE loop must produce the same merge sequence as
    a direct single-machine implementation on the same word counts."""
    from collections import Counter

    from tubes_spark.operators import bpe

    corpus = [
        ("the cat sat on the mat",),
        ("the cats eat the fish",),
        ("a cat and a hat",),
    ]
    df = spark.createDataFrame(corpus, "text string")
    got = bpe.bpe_train(df, n_merges=8)

    # pure-Python reference (Sennrich-style, string-level symbols)
    vocab = Counter()
    for (t,) in corpus:
        for w in t.lower().split():
            vocab[w] += 1
    syms = {w: list(w) for w in vocab}

    def top_pair():
        pc = Counter()
        for w, n in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += n
        if not pc:
            return None
        return sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]

    expected = []
    for _ in range(8):
        t = top_pair()
        if t is None:
            break
        (a, b), cnt = t
        expected.append((a, b, cnt))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    assert got == expected, f"{got} != {expected}"
