"""Round-5b additions: physical layout (contiguous ids, shuffle
manifest), binned no-equi-key range join, and the curation-depth
queries.  Exact-value correctness is covered by test_oracle_parity
(DuckDB twins); these tests pin the properties the oracle cannot see:
determinism under repartitioning, plan shape, and pairwise-join
equivalence.
"""

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from tubes_spark import queries as Q
from tubes_spark.operators import joins, layout
from tubes_spark.plans import plan_of


# --------------------------------------------------------------------------
# layout.assign_contiguous_ids
# --------------------------------------------------------------------------

def test_contiguous_ids_dense_and_ordered(spark):
    df = spark.range(1000).select((F.col("id") * 7 % 1000).alias("k"))
    out = layout.assign_contiguous_ids(df, "k", n_parts=8).orderBy("k")
    rows = out.collect()
    assert [r.global_id for r in rows] == list(range(1000))
    assert [r.k for r in rows] == sorted(r.k for r in rows)


def test_contiguous_ids_partition_count_invariant(spark):
    """Ids depend only on the key's total order, not on the incoming
    partitioning or the chosen n_parts."""
    df = spark.range(500).select((F.col("id") * 13 % 500).alias("k"))
    a = layout.assign_contiguous_ids(df.repartition(3), "k", n_parts=4)
    b = layout.assign_contiguous_ids(df.repartition(17), "k", n_parts=9)
    assert a.orderBy("k").collect() == b.orderBy("k").collect()


def test_contiguous_ids_single_partition_only_for_offsets(spark):
    """The data path must not pass through Exchange SinglePartition —
    only the n_parts-row offsets table may (bounded by the partition
    count, not the data)."""
    df = spark.range(10_000).select(F.col("id").alias("k"))
    p = plan_of(layout.assign_contiguous_ids(df, "k", n_parts=16))
    assert p.count("SinglePartition") <= 1


# --------------------------------------------------------------------------
# layout.shuffle_manifest
# --------------------------------------------------------------------------

def test_shuffle_manifest_reproducible_and_dense(spark):
    df = spark.range(400).select(F.col("id").alias("k"))
    a = layout.shuffle_manifest(df, "k", n_shards=8).collect()
    b = layout.shuffle_manifest(df.repartition(13), "k", n_shards=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_shard = {}
    for r in a:
        assert 0 <= r.shard < 8
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), f"shard {shard} not dense"


def test_shuffle_manifest_seed_changes_order(spark):
    df = spark.range(400).select(F.col("id").alias("k"))
    a = layout.shuffle_manifest(df, "k", n_shards=8, seed="42").collect()
    b = layout.shuffle_manifest(df, "k", n_shards=8, seed="43").collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, b))


# --------------------------------------------------------------------------
# joins.binned_range_join
# --------------------------------------------------------------------------

def _mk_intervals(spark, n=32):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("win_id"),
            (
                F.lit("2024-01-01").cast("timestamp")
                + F.make_interval(hours=F.col("id") * 5, mins=F.lit(11))
            ).alias("ws"),
        )
        .withColumn("we", F.col("ws") + F.make_interval(hours=F.lit(9)))
    )


def test_binned_range_join_equals_theta_join(spark):
    from tubes_spark.catalog import load_table

    e = load_table(spark, "events", SF_SMALL).select("event_id", "ts")
    iv = _mk_intervals(spark)
    binned = joins.binned_range_join(e, iv, "ts", "ws", "we", bin_seconds=3600)
    naive = joins.range_join(e, iv, F.col("ts"), F.col("ws"), F.col("we"))
    got = sorted((r.event_id, r.win_id) for r in binned.collect())
    want = sorted((r.event_id, r.win_id) for r in naive.collect())
    assert got == want and len(got) > 0


def test_binned_range_join_no_duplicate_pairs(spark):
    from tubes_spark.catalog import load_table

    e = load_table(spark, "events", SF_SMALL).select("event_id", "ts")
    iv = _mk_intervals(spark)
    out = joins.binned_range_join(e, iv, "ts", "ws", "we", bin_seconds=3600)
    n = out.count()
    nd = out.select("event_id", "win_id").distinct().count()
    assert n == nd


def test_binned_range_join_subsecond_bounds(spark):
    # An interval whose hi has fractional seconds must still emit its
    # final bin: point at 12.25s ∈ [10s, 12.5s) was silently dropped by
    # whole-second bin math (floor((unix_timestamp(hi)-1)/bin) ends the
    # expansion one bin early).  Bins now run on microseconds.
    pt = spark.createDataFrame(
        [("p1", "2024-01-01 00:00:12.25"), ("p2", "2024-01-01 00:00:12.75")],
        "pid string, ts_s string",
    ).select("pid", F.col("ts_s").cast("timestamp").alias("ts"))
    iv = spark.createDataFrame(
        [("w1", "2024-01-01 00:00:10", "2024-01-01 00:00:12.5")],
        "win_id string, lo_s string, hi_s string",
    ).select(
        "win_id",
        F.col("lo_s").cast("timestamp").alias("ws"),
        F.col("hi_s").cast("timestamp").alias("we"),
    )
    out = joins.binned_range_join(pt, iv, "ts", "ws", "we", bin_seconds=4)
    got = sorted((r.pid, r.win_id) for r in out.collect())
    assert got == [("p1", "w1")]  # p2 is past hi; p1 must NOT be dropped


def test_binned_range_join_plans_hash_join(spark):
    from tubes_spark.catalog import load_table

    e = load_table(spark, "events", SF_SMALL).select("event_id", "ts")
    iv = _mk_intervals(spark)
    p = plan_of(joins.binned_range_join(e, iv, "ts", "ws", "we", bin_seconds=3600))
    assert "NestedLoop" not in p
    assert any(k in p for k in ("BroadcastHashJoin", "ShuffledHashJoin", "SortMergeJoin"))


# --------------------------------------------------------------------------
# curation queries: properties beyond the oracle
# --------------------------------------------------------------------------

def test_gopher_flags_split_the_corpus(spark):
    out = Q.gopher_quality_flags(spark, SF_SMALL).select("keep").collect()
    kept = sum(1 for r in out if r.keep)
    assert 0 < kept < len(out), "thresholds must discriminate, not rubber-stamp"


def test_vocab_oov_rate_bounds(spark):
    rows = Q.vocab_oov_rate(spark, SF_SMALL).collect()
    assert all(0.0 <= r.oov_rate <= 1.0 for r in rows)
    assert any(r.n_oov > 0 for r in rows), "top-20 vocab must leave some OOV"


def test_ngram_cosine_pairs_bounded_and_sorted(spark):
    rows = Q.ngram_cosine_top_pairs(spark, SF_SMALL).collect()
    assert len(rows) == 50
    assert all(-1.0 <= r.cosine <= 1.0 + 1e-9 for r in rows)
    sims = [r.cosine for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_closest_pair_levenshtein_blocks_unique(spark):
    rows = Q.closest_pair_levenshtein(spark, SF_SMALL).collect()
    blocks = [(r.lang, r.tok1, r.band) for r in rows]
    assert len(blocks) == len(set(blocks)), "one winner per block"
    assert all(r.doc_a < r.doc_b and r.lev >= 0 for r in rows)


# --------------------------------------------------------------------------
# BPE encode (the oracle certifies train+encode end to end; these pin
# the encoder expression against the pure-Python reference)
# --------------------------------------------------------------------------

def test_bpe_encode_expr_matches_python_reference(spark):
    from tubes_spark.operators import bpe

    merges = [("a", "b"), ("ab", "c"), ("d", "d"), ("x", "abc")]
    words = ["abc", "abcabc", "dddd", "xabc", "aab", "abb", "zzz", "a", ""]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    enc = bpe.encode_doc_expr(F.col("w"), merges)
    out = df.select(
        F.col("w"), bpe.token_count_from_encoded(enc).alias("n")
    ).collect()
    for r in out:
        assert r.n == len(bpe.encode_tokens_py(r.w, merges)), r.w


def test_bpe_encode_word_boundaries_respected(spark):
    """A merge never crosses a space: 'a b' stays two symbols even with
    merge (a, b)."""
    from tubes_spark.operators import bpe

    df = spark.createDataFrame([("a b ab",)], "w string")
    enc = bpe.encode_doc_expr(F.col("w"), [("a", "b")])
    n = df.select(bpe.token_count_from_encoded(enc).alias("n")).collect()[0].n
    # "a b ab" -> symbols: [a], [b], [ab merged] = 3
    assert n == 3


# --------------------------------------------------------------------------
# IVF assignment + curriculum (oracle covers values; pin invariants)
# --------------------------------------------------------------------------

def test_ivf_assign_covers_every_vector_once(spark):
    from tubes_spark.catalog import load_table

    out = Q.ivf_assign_cells(spark, SF_SMALL)
    n_vec = load_table(spark, "embeddings", SF_SMALL).count()
    assert out.count() == n_vec
    assert out.select("vec_id").distinct().count() == n_vec
    assert all(r.dist2 >= 0 for r in out.collect())


def test_curriculum_phases_are_balanced_terciles(spark):
    rows = Q.curriculum_phases(spark, SF_SMALL).collect()
    from collections import Counter

    c = Counter(r.phase for r in rows)
    assert set(c) == {0, 1, 2}
    n = len(rows)
    # exact-percentile boundaries with ties: each phase within 2x of n/3
    assert all(n / 6 <= c[p] <= 2 * n / 3 for p in c), c


# --------------------------------------------------------------------------
# CMS / Bloom hard guarantees (the oracle certifies the values; these
# pin the structural guarantees as loud failures)
# --------------------------------------------------------------------------

def test_cms_never_undercounts_and_collides(spark):
    rows = Q.cms_token_frequencies(spark, SF_SMALL).collect()
    assert all(r.no_undercount for r in rows), "CMS must never undercount"
    assert any(r.overcount > 0 for r in rows), (
        "w=16 is sized to force collisions; all-zero overcounts means the "
        "probe stopped exercising the estimate path"
    )


def test_bloom_no_false_negatives_and_some_fps(spark):
    rows = Q.bloom_decontaminate_check(spark, SF_SMALL).collect()
    assert all(r.no_false_negative for r in rows), "Bloom must never drop a member"
    assert any(r.false_positive for r in rows), (
        "m=16384 over the trigram member set is sized so the FP path is "
        "actually exercised"
    )
    assert any(not r.in_exact and not r.in_bloom for r in rows), (
        "true negatives must exist or the filter rejects nothing"
    )


def test_pagerank_mass_conserved_and_positive(spark):
    """With no dangling nodes (every graph node has >=1 edge by
    construction), total rank must stay ~1 through the iterations;
    every node keeps at least the teleport floor."""
    rows = Q.doc_centrality_pagerank(spark, SF_SMALL).collect()
    n = len(rows)
    total = sum(r.rank for r in rows)
    assert abs(total - 1.0) < 1e-6, total
    floor = (1.0 - 0.85) / n
    assert all(r.rank >= floor - 1e-9 for r in rows)


def test_prefix_join_equals_bruteforce(spark):
    """The prefix filter must not lose any pair >= the threshold:
    compare against a no-prefix brute-force shingle join."""
    from tubes_spark.catalog import load_table
    from tubes_spark.operators import text as T

    d = load_table(spark, "documents", SF_SMALL)
    toks = T.tokenize(F.col("text"))
    s = d.select("doc_id", F.explode(T.word_shingles_from_tokens(toks, 5)).alias("sh")).distinct()
    sz = s.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = s.select(F.col("doc_id").alias("doc_a"), "sh")
    b = s.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = a.join(b, "sh").filter(F.col("doc_a") < F.col("doc_b")).groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("i"))
    na = sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    brute = inter.join(na, "doc_a").join(nb, "doc_b").filter(
        F.round(F.col("i") / (F.col("na") + F.col("nb") - F.col("i")), 6) >= 0.8
    )
    want = sorted((r.doc_a, r.doc_b) for r in brute.collect())
    got = sorted((r.doc_a, r.doc_b) for r in Q.jaccard_exact_prefix_join(spark, SF_SMALL).collect())
    assert got == want and len(got) > 0


def test_funnel_3step_triples_ordered(spark):
    rows = Q.funnel_3step_batch(spark, SF_SMALL).collect()
    assert all(r.micros_to_convert > 0 and r.micros_to_convert <= 6 * 3600 * 1_000_000 for r in rows)
    users = [r.user_id for r in rows]
    assert len(users) == len(set(users)), "one earliest funnel per user"
