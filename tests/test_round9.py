"""Round 9: ADVICE-r8 fixes (compaction publish, funnel empty-doc
parity, fingerprint canonical escaping, size_buckets fallback) and the
incremental input fingerprint (VERDICT r8 next-round #5)."""

import json
import os
from pathlib import Path

import pandas as pd
import pytest

from tests.conftest import SF_MED, SF_SMALL


# ------------------------------------------------------------------ memo


def test_content_fingerprint_separator_injection_safe(spark):
    """ADVICE r8: the old concat_ws('\\x1f') canonical let a value
    containing the separator shift column boundaries — ('a\\x1fb','c')
    and ('a','b\\x1fc') collided.  The JSON canonical must not."""
    from tubes_spark.memo import content_fingerprint

    a = spark.createDataFrame([("a\x1fb", "c")], "x string, y string")
    b = spark.createDataFrame([("a", "b\x1fc")], "x string, y string")
    assert content_fingerprint(a) != content_fingerprint(b)


def test_content_fingerprint_null_vs_sentinel_string(spark):
    """A literal '\\x00' string used to collide with SQL NULL."""
    from tubes_spark.memo import content_fingerprint

    a = spark.createDataFrame([("k", None)], "x string, y string")
    b = spark.createDataFrame([("k", "\x00")], "x string, y string")
    c = spark.createDataFrame([("k", "null")], "x string, y string")
    assert len({content_fingerprint(d) for d in (a, b, c)}) == 3


def test_input_fingerprint_matches_full_scan_and_reads_nothing_when_cached(
    spark, tmp_path
):
    """The incremental per-file fingerprint must equal the one-shot
    distributed digest, and an unchanged input must need NO Spark
    session at all (the structural zero-data-read proof)."""
    from tubes_spark.memo import content_fingerprint, input_fingerprint

    d = str(tmp_path / "inp")
    spark.range(0, 1000).selectExpr("id", "md5(cast(id as string)) as s").repartition(
        3
    ).write.parquet(d)
    cache = str(tmp_path / "digests.json")
    fp = input_fingerprint(spark, d, cache)
    assert fp == content_fingerprint(spark.read.parquet(d))
    # cached path: spark=None would crash on any data read
    assert input_fingerprint(None, d, cache) == fp


def test_input_fingerprint_invalidation_add_change_remove(spark, tmp_path):
    """File add / in-place change / remove each move the fingerprint,
    and each new state still matches the one-shot full-scan digest."""
    from tubes_spark.memo import content_fingerprint, input_fingerprint

    d = tmp_path / "inp"
    cache = str(tmp_path / "digests.json")
    spark.range(0, 100).repartition(2).write.parquet(str(d))
    fp0 = input_fingerprint(spark, str(d), cache)
    seen = {fp0}

    # add a file
    extra = d / "part-extra.parquet"
    pd.DataFrame({"id": [1000, 1001]}).to_parquet(extra)
    fp_add = input_fingerprint(spark, str(d), cache)
    assert fp_add not in seen and fp_add == content_fingerprint(
        spark.read.parquet(str(d))
    )
    seen.add(fp_add)

    # change that file in place (status changes via size/mtime)
    pd.DataFrame({"id": [2000, 2001, 2002]}).to_parquet(extra)
    os.utime(extra, ns=(1, 1))  # force a distinct mtime even on coarse clocks
    fp_chg = input_fingerprint(spark, str(d), cache)
    assert fp_chg not in seen and fp_chg == content_fingerprint(
        spark.read.parquet(str(d))
    )
    seen.add(fp_chg)

    # remove it: drops out of the sum with zero re-reads (spark=None) —
    # and because content is restored to the original, the fingerprint
    # returns EXACTLY to its initial value (content-defined, not
    # history-defined)
    extra.unlink()
    fp_rm = input_fingerprint(None, str(d), cache)
    assert fp_rm == fp0 != fp_chg
    assert fp_rm == content_fingerprint(spark.read.parquet(str(d)))


def test_input_fingerprint_only_rescans_stale_files(spark, tmp_path):
    """After one new file lands, the rescan touches just that file —
    the cache entries for unchanged files keep their original (size,
    mtime, digest) triplets byte-for-byte."""
    from tubes_spark.memo import input_fingerprint

    d = tmp_path / "inp"
    cache = Path(tmp_path / "digests.json")
    spark.range(0, 50).repartition(2).write.parquet(str(d))
    input_fingerprint(spark, str(d), str(cache))
    before = json.loads(cache.read_text())["files"]
    pd.DataFrame({"id": [7]}).to_parquet(d / "part-extra.parquet")
    input_fingerprint(spark, str(d), str(cache))
    after = json.loads(cache.read_text())["files"]
    assert set(after) == set(before) | {"part-extra.parquet"}
    for rel in before:
        assert after[rel] == before[rel]


# ------------------------------------------------------------------ funnel


def test_funnel_attribution_empty_docs_match_oracle(spark, tmp_path):
    """ADVICE r8: empty/whitespace-only documents diverged (Spark
    tokenize -> [] nulls the fraction rules; DuckDB split -> ['']).
    Both engines must now agree on the full attribution row."""
    import duckdb

    from tests.oracle_harness import _norm
    from tubes_spark import queries
    from tubes_spark.oracles import ORACLES

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                "",
                "   \t  ",
                "the a of to and is in " * 30,
                "x",
                "the a of to and is in " * 30,  # exact dup of 2
            ],
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    docs.to_parquet(sf / "documents.parquet")
    sp = queries.curation_funnel_attribution(spark, str(sf)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf / 'documents.parquet'}')"
    )
    du = con.execute(ORACLES["curation_funnel_attribution"]).fetchdf()
    con.close()
    a, b = _norm(sp), _norm(du)
    assert a.astype(str).equals(b.astype(str)), f"\n{a}\nvs\n{b}"
    # doc 0 (empty) takes the quality path with every 'low' rule failed;
    # doc 1 (whitespace) normalizes to '' and is its exact dup
    byid = sp.set_index("doc_id")
    assert byid.loc[0, "fail_mask"] == 117
    assert byid.loc[0, "first_failed_rule"] == "too_short"
    assert byid.loc[1, "stage"] == "exact_dup" and byid.loc[1, "dup_owner"] == 0
    assert byid.loc[4, "stage"] == "exact_dup" and byid.loc[4, "dup_owner"] == 2


# ------------------------------------------------------------------ sources


class _StubDF:
    """DataFrame stand-in whose optimizer stats are unreachable."""

    def __init__(self, files):
        self._files = files

    def inputFiles(self):
        return self._files

    @property
    def _jdf(self):
        raise RuntimeError("no JVM plan available")


def test_size_buckets_falls_back_to_file_status_with_warning(tmp_path):
    """ADVICE r8: when the private optimizer-stats API fails, the bucket
    count derives from input file status (public API) and WARNS rather
    than silently reverting to the fixed minimum."""
    from tubes_spark.sources import size_buckets

    big = tmp_path / "big.bin"
    big.write_bytes(b"\x00" * (200 * 1024 * 1024))  # 200MB -> *3 = 600MB est
    with pytest.warns(RuntimeWarning, match="input file status"):
        n = size_buckets(_StubDF([f"file:{big}"]), target_bucket_mb=128, min_buckets=1)
    assert n == 5  # ceil(200*3/128)


def test_size_buckets_min_fallback_warns(tmp_path):
    from tubes_spark.sources import size_buckets

    with pytest.warns(RuntimeWarning, match="min_buckets"):
        n = size_buckets(_StubDF([]), min_buckets=8)
    assert n == 8


# ------------------------------------------------------------ band-size cap


def test_band_cap_bounds_candidates_and_keeps_recall_contract(spark, tmp_path):
    """VERDICT r8 #6: a (len_band, band) group above _BAND_CAP docs is
    split by the secondary md5 digit.  On a deliberately skewed corpus
    (250 docs colliding in one band, cap 200) the cap must FIRE, the
    Spark result must still hash-match the oracle (both sides carry the
    same CASE), and the recall contract must hold exactly: every pair
    agreeing on (len_band, band, band2) is kept; every dropped in-band
    pair differs in band2."""
    import hashlib
    from itertools import combinations

    import duckdb

    from tests.oracle_harness import _norm
    from tubes_spark import queries
    from tubes_spark.oracles import ORACLES

    # 250 docs whose md5 first hex digit is '0' (one oversized group),
    # plus 60 spread across other bands (under the cap)
    hot, cold, i = [], [], 0
    while len(hot) < 250 or len(cold) < 60:
        t = f"synthetic document number {i} body"
        d = hashlib.md5(t.encode()).hexdigest()
        if d[0] == "0" and len(hot) < 250:
            hot.append(t)
        elif d[0] != "0" and len(cold) < 60:
            cold.append(t)
        i += 1
    texts = hot + cold
    docs = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts, "n_chars": [100] * len(texts)}
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    docs.to_parquet(sf / "documents.parquet")

    sp = queries.bucketed_dedup_enrich_join(spark, str(sf)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf / 'documents.parquet'}')"
    )
    du = con.execute(ORACLES["bucketed_dedup_enrich_join"]).fetchdf()
    con.close()
    assert _norm(sp).astype(str).equals(_norm(du).astype(str))

    # recall contract, checked against ground truth
    d2 = {
        i: int(hashlib.md5(t.encode()).hexdigest()[1], 16)
        for i, t in enumerate(texts)
    }
    got = {tuple(sorted((a, b))) for a, b in zip(sp["doc_a"], sp["doc_b"])}
    hot_ids = list(range(len(hot)))
    full_hot = {tuple(sorted(p)) for p in combinations(hot_ids, 2)}
    same_band2 = {p for p in full_hot if d2[p[0]] == d2[p[1]]}
    # (a) the cap fired: in-band pairs were dropped
    assert len(got & full_hot) < len(full_hot)
    # (b) kept exactly the same-band2 pairs of the oversized group
    assert got & full_hot == same_band2
    # (c) under-cap groups are untouched: every same-(band) cold pair kept
    for a, b in combinations(range(len(hot), len(texts)), 2):
        if hashlib.md5(texts[a].encode()).hexdigest()[0] == hashlib.md5(
            texts[b].encode()
        ).hexdigest()[0]:
            assert (a, b) in got


# -------------------------------------------------- interleave order guard


def test_interleave_misordered_replay_fails_loudly(spark, tmp_path):
    """VERDICT r8 #7: the incremental interleave's in-order delivery
    contract is now guarded by the ledger's per-side max event time —
    a replay that delivers a side's slices out of order must raise,
    not silently misinterleave."""
    from pyspark.sql import functions as F

    from tubes_spark.streaming.run import (
        merge_streams_interleaved,
        write_ordered_slices,
    )

    schema = "seq long, value string"
    a_all = spark.createDataFrame([(i, f"A{i}") for i in range(1, 5)], schema)
    b_all = spark.createDataFrame([(i, f"B{i}") for i in range(1, 5)], schema)
    # side A delivered OUT of order: high-seq slice first, low-seq second
    write_ordered_slices(
        a_all, [F.col("seq") >= 3, F.col("seq") <= 2], str(tmp_path / "a")
    )
    write_ordered_slices(
        b_all, [F.col("seq") <= 2, F.col("seq") >= 3], str(tmp_path / "b")
    )

    def stream(p):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(tmp_path / p))
        )

    with pytest.raises(Exception, match="out-of-order delivery"):
        merge_streams_interleaved(
            stream("a"), stream("b"), ["seq"],
            str(tmp_path / "out"), str(tmp_path / "ck"),
        ).collect()


# ------------------------------------------------------- rocksdb state store


def test_rocksdb_provider_actually_engages(spark, tmp_path):
    """VERDICT r8 #1: inside the scope, a stateful streaming query must
    run its state on RocksDB — proven by the provider's own custom
    metrics in the query progress, not just by the conf value."""
    from pyspark.sql import functions as F

    from tubes_spark.session import ROCKSDB_PROVIDER, state_store_rocksdb

    spark.range(0, 200).selectExpr(
        "id % 7 as k", "id as v", "timestamp_seconds(1700000000 + id) as ts"
    ).write.parquet(str(tmp_path / "in"))
    with state_store_rocksdb(spark):
        assert (
            spark.conf.get("spark.sql.streaming.stateStore.providerClass")
            == ROCKSDB_PROVIDER
        )
        s = (
            spark.readStream.schema("k long, v long, ts timestamp")
            .option("maxFilesPerTrigger", "4")
            .parquet(str(tmp_path / "in"))
        )
        agg = s.withWatermark("ts", "1 hour").groupBy("k").agg(
            F.sum("v").alias("s")
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("rocks_engage")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        so = q.lastProgress["stateOperators"][0]
        assert so["numRowsTotal"] == 7
        assert any("rocksdb" in k.lower() for k in so.get("customMetrics", {}))
    # scope restored: provider back to the session default
    assert (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        != ROCKSDB_PROVIDER
    )


def test_running_fold_eviction_provider_parity(spark, tmp_path):
    """The raw fold's watermark-eviction emissions must be
    byte-identical on the default (in-heap) and RocksDB providers —
    the bounded-state protocol is provider-independent."""
    from pyspark.sql import functions as F

    from tubes_spark.session import state_store_rocksdb
    from tubes_spark.streaming.run import write_ordered_slices
    from tubes_spark.streaming.state import running_fold

    SEC = 1_000_000
    B = 1_700_000_000 * SEC
    rows = [
        (1, B + 0 * SEC, 1.0),
        (2, B + 5 * SEC, 2.0),
        (1, B + 600 * SEC, 3.0),      # u1 revisits inside horizon
        (2, B + 9000 * SEC, 4.0),     # far future: watermark evicts u1
        (3, B + 9001 * SEC, 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_us long, v double")
    write_ordered_slices(
        df,
        [F.col("ts_us") < B + 300 * SEC,
         (F.col("ts_us") >= B + 300 * SEC) & (F.col("ts_us") < B + 8000 * SEC),
         F.col("ts_us") >= B + 8000 * SEC],
        str(tmp_path / "in"),
    )

    def drain(ck):
        seen: list = []
        stream = (
            spark.readStream.schema("user_id long, ts_us long, v double")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(tmp_path / "in"))
            .withColumn("ts", F.timestamp_micros("ts_us"))
            .withWatermark("ts", "10 seconds")
        )
        fold = running_fold(
            stream, ["user_id"], "v", op="sum",
            event_time_col="ts", evict_gap_ms=1_200_000,
        )
        q = (
            fold.writeStream.foreachBatch(
                lambda bdf, _bid: seen.extend(tuple(r) for r in bdf.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return sorted(seen)

    default_run = drain("ck_default")
    with state_store_rocksdb(spark):
        rocks_run = drain("ck_rocks")
    assert rocks_run == default_run
    assert len(default_run) > 0


@pytest.mark.parametrize(
    "case",
    ["ttl_sessions", "full_outer_join", "space_saving"],
)
def test_kill_resume_parity_on_rocksdb(spark, tmp_path, case):
    """VERDICT r8 #1: the r8 kill/resume parity suite re-run with the
    checkpoints' state on RocksDB — restart rehydration must work from
    RocksDB snapshots + changelog exactly as from the in-heap store."""
    from tests.test_round8 import (
        test_full_outer_join_kill_resume_parity,
        test_space_saving_stream_kill_resume_parity,
        test_ttl_sessions_kill_resume_parity,
    )
    from tubes_spark.session import state_store_rocksdb

    fn = {
        "ttl_sessions": test_ttl_sessions_kill_resume_parity,
        "full_outer_join": test_full_outer_join_kill_resume_parity,
        "space_saving": test_space_saving_stream_kill_resume_parity,
    }[case]
    with state_store_rocksdb(spark):
        fn(spark, tmp_path)


# ------------------------------------------- round-9 capability invariants


def test_record_linkage_dirty_records_always_relink(spark):
    """A dirty variant always satisfies the match rule against its own
    base (same block, levenshtein 1, bal drift < 1.0), so no entity can
    consist of dirty records only, and entity accounting must conserve
    the record set."""
    from pyspark.sql import functions as F

    from tubes_spark import queries as Q

    df = Q.record_linkage_entities(spark, SF_SMALL)
    rows = df.collect()
    assert all(r.n_records > r.n_dirty for r in rows if r.n_dirty > 0)
    # conservation: 150 base records at sf0.001 plus one per md5-even name
    n_dirty_total = sum(r.n_dirty for r in rows)
    assert sum(r.n_records for r in rows) == 150 + n_dirty_total
    assert n_dirty_total > 0  # the dirty branch actually fired
    # multi-record entities exist and each spans >= 1 source customer
    merged = [r for r in rows if r.n_records > 1]
    assert merged and all(r.n_sources >= 1 for r in rows)
    # entity id is the smallest member rec_id -> never exceeds 2*maxkey+1
    assert all(r.entity_id >= 0 for r in rows)


def test_k_anonymity_no_released_group_below_k(spark):
    from tubes_spark import queries as Q

    rows = Q.k_anonymity_generalize(spark, SF_SMALL).collect()
    # every customer classified exactly once
    keys = [r.c_custkey for r in rows]
    assert len(keys) == len(set(keys)) == 150
    for r in rows:
        if r.level < 3:
            assert r.group_size >= 5
            assert r.qi_geo is not None and r.qi_seg is not None
            assert r.qi_band is not None
        else:
            assert r.qi_geo is None and r.qi_seg is None and r.qi_band is None
            assert r.group_size == 0
    # the ladder must actually generalize somewhere at this SF
    assert {r.level for r in rows} - {0}, "ladder never escalated"


def test_rag_hybrid_rrf_rank_arithmetic(spark):
    """The fused score must be exactly the RRF of the per-leg ranks the
    row itself reports, and each query emits a full, correctly-ordered
    top-10."""
    from tubes_spark import queries as Q

    rows = Q.rag_hybrid_rrf(spark, SF_SMALL).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {1, 2, 3}
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.final_rank)
        assert [r.final_rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) == 10
        prev = None
        for r in rs:
            expect = (1.0 / (60 + r.lex_rank) if r.lex_rank else 0.0) + (
                1.0 / (60 + r.ql_rank) if r.ql_rank else 0.0
            )
            assert abs(r.rrf - expect) < 1e-6
            assert r.lex_rank <= 20 and r.ql_rank <= 20
            if prev is not None:
                assert r.rrf <= prev + 1e-12  # fused order is by rrf desc
            prev = r.rrf


def test_lm_backoff_filter_invariants(spark):
    """Stupid-backoff scores are finite negatives, tertiles split the
    eval set into near-equal thirds, and keep == (tertile <= 2)."""
    from tubes_spark import queries as Q

    rows = Q.lm_stupid_backoff_filter(spark, SF_SMALL).collect()
    assert rows, "eval split empty"
    # md5 parity split: eval docs only, each exactly once
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))
    sizes = {}
    for r in rows:
        assert r.n_bigrams > 0
        assert r.avg_logp < 0.0  # every bigram log-prob is negative
        assert r.keep == (1 if r.tertile <= 2 else 0)
        sizes[r.tertile] = sizes.get(r.tertile, 0) + 1
    assert set(sizes) == {1, 2, 3}
    assert max(sizes.values()) - min(sizes.values()) <= 1  # ntile contract
    # the filter keeps exactly the top two tertiles by score
    kept = sorted(r.avg_logp for r in rows if r.keep)
    dropped = sorted(r.avg_logp for r in rows if not r.keep)
    assert kept[0] >= dropped[-1] - 1e-12


def test_zorder_skipping_beats_linear(spark):
    """Zone-map accounting is conserved across layouts, and the Z-order
    layout never reads more files than the time-linear one for the 2-D
    rectangle (the point of the operator)."""
    from tubes_spark import queries as Q

    rows = {r.layout: r for r in Q.layout_zorder_skipping(spark, SF_SMALL).collect()}
    assert set(rows) == {"zorder", "linear", "user"}
    match = {r.rows_match for r in rows.values()}
    assert len(match) == 1  # the predicate answer is layout-independent
    for r in rows.values():
        assert r.files_total == 64
        assert 0 < r.files_read <= 64
        assert r.rows_read >= r.rows_match
    assert rows["zorder"].files_read < rows["linear"].files_read
    assert rows["zorder"].files_read <= rows["user"].files_read
    assert rows["zorder"].rows_read < rows["linear"].rows_read


def test_morton_spread_is_interleave(spark):
    """_morton_spread16 equals the bit-by-bit spread for a sweep of
    16-bit values (pure-python reference)."""
    from pyspark.sql import functions as F

    from tubes_spark.queries import _morton_spread16

    vals = list(range(64)) + [255, 256, 1023, 4095, 65535]
    df = spark.createDataFrame([(v,) for v in vals], "v long").select(
        "v", _morton_spread16(F.col("v")).alias("s")
    )
    for r in df.collect():
        expect = 0
        for i in range(16):
            expect |= ((r.v >> i) & 1) << (2 * i)
        assert r.s == expect, (r.v, r.s, expect)


def test_write_zordered_physical_pruning(spark, tmp_path):
    """The PHYSICAL z-order write: parquet footer stats of the two real
    dimensions must let a 2-D rectangle skip more files than the
    time-linear layout of the same rows, and the read-back answer must
    be identical.  This is the on-disk counterpart of the
    layout_zorder_skipping accounting query."""
    from pyspark.sql import functions as F

    from tubes_spark import sources
    from tubes_spark.catalog import load_table

    e = load_table(spark, "events", SF_MED).select(
        "event_id",
        (F.col("user_id") % 16).cast("long").alias("u"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("day"),
    )
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "l")
    sources.write_zordered(e, zpath, "u", "day", n_files=64)
    sources.write_sorted_by(e, lpath, ["event_id"], n_files=64)

    def files_read(path):
        stats = sources.parquet_file_stats(path, ["u", "day"])
        assert len(stats) == 64 and all(
            s["u_min"] is not None for s in stats
        ), "footer stats missing"
        return [
            s
            for s in stats
            if not (
                s["u_max"] < 4 or s["u_min"] > 7
                or s["day_max"] < 7 or s["day_min"] > 13
            )
        ]

    zread, lread = files_read(zpath), files_read(lpath)
    assert len(zread) < len(lread), (len(zread), len(lread))

    rect = (F.col("u").between(4, 7)) & (F.col("day").between(7, 13))
    expect = sorted(r.event_id for r in e.filter(rect).collect())
    got = sorted(
        r.event_id for r in spark.read.parquet(zpath).filter(rect).collect()
    )
    assert got == expect

    # the synthetic z key must NOT survive on disk
    assert "__tubes_zkey" not in spark.read.parquet(zpath).columns


def test_retrieval_eval_metrics_invariants(spark):
    """Metric arithmetic sanity independent of the oracle: bounds,
    denominator consistency, and MRR/first-hit agreement per leg."""
    from tubes_spark import queries as Q

    rows = Q.retrieval_eval_metrics(spark, SF_SMALL).collect()
    assert len(rows) == 6  # 3 queries x 2 legs
    assert {(r.query_id, r.leg) for r in rows} == {
        (q, l) for q in (1, 2, 3) for l in ("bm25", "ql")
    }
    by_q = {}
    for r in rows:
        assert 0 <= r.recall_at_10 <= 1.0
        assert 0 <= r.mrr_at_20 <= 1.0
        assert 0 <= r.ndcg_at_10 <= 1.0 + 1e-9
        assert r.hits_top10 <= 10 and r.hits_top10 <= r.n_relevant
        assert abs(r.recall_at_10 - round(r.hits_top10 / r.n_relevant, 6)) < 1e-9
        # a leg with top-10 hits must have found its first hit by rank 10
        if r.hits_top10 > 0:
            assert r.mrr_at_20 >= round(1.0 / 10, 6) - 1e-9
            assert r.ndcg_at_10 > 0
        by_q.setdefault(r.query_id, []).append(r)
    # the relevance denominator is leg-independent
    for q, rs in by_q.items():
        assert len({r.n_relevant for r in rs}) == 1


# ------------------------------------------- right-to-be-forgotten delete


def _write_group_epochs(spark, g, frames):
    from tubes_spark.sink import _CURRENT_EPOCH, Sink

    sink = Sink.atomic_parquet_group(g, {"a": None, "b": None})
    for ep, df in enumerate(frames):
        token = _CURRENT_EPOCH.set(ep)
        try:
            sink(df)
        finally:
            _CURRENT_EPOCH.reset(token)
    return sink


def test_delete_rows_atomic_scrubs_history_and_disk(spark, tmp_path):
    """The delete must (1) remove matching rows from the live view,
    (2) remove them from EVERY as-of snapshot (GDPR beats time travel),
    (3) leave no byte of them on disk after the purge, (4) keep the
    epoch lineage of surviving rows, and (5) be idempotent."""
    import glob

    import duckdb
    from pyspark.sql import functions as F

    from tubes_spark.sink import Sink

    g = str(tmp_path / "grp")
    frames = [
        spark.range(0, 10).withColumn("u", F.col("id") % 4),
        spark.range(10, 20).withColumn("u", F.col("id") % 4),
        spark.range(20, 30).withColumn("u", F.col("id") % 4),
    ]
    _write_group_epochs(spark, g, frames)

    n = Sink.delete_rows_atomic(spark, g, "u = 3")
    assert n == {"a": 7, "b": 7}  # ids 3,7,11,15,19,23,27

    live = Sink.read_atomic_group(spark, g, "a")
    ids = sorted(r.id for r in live.collect())
    assert ids == [i for i in range(30) if i % 4 != 3]
    # epoch lineage survives for the keepers
    eps = {r.id: r.epoch for r in live.collect()}
    assert eps[0] == 0 and eps[12] == 1 and eps[29] == 2

    # time travel still works but never returns a purged row
    snap0 = Sink.read_atomic_group(spark, g, "b", as_of_epoch=0)
    assert sorted(r.id for r in snap0.collect()) == [0, 1, 2, 4, 5, 6, 8, 9]
    snap1 = Sink.read_atomic_group(spark, g, "b", as_of_epoch=1)
    assert all(r.u != 3 for r in snap1.collect())

    # disk-level scrub: no remaining parquet file contains u = 3
    con = duckdb.connect()
    for f in glob.glob(f"{g}/**/*.parquet", recursive=True):
        cnt = con.execute(
            f"SELECT count(*) FROM read_parquet('{f}') WHERE u = 3"
        ).fetchone()[0]
        assert cnt == 0, f
    con.close()

    # idempotent rerun
    assert Sink.delete_rows_atomic(spark, g, "u = 3") == {"a": 0, "b": 0}


def test_delete_rows_atomic_crash_before_marker_is_invisible(spark, tmp_path, monkeypatch):
    """A crash after the consolidated no-match copies land but BEFORE
    the marker repoints must leave readers on the full pre-delete
    table; the rerun completes the scrub."""
    import os as _os

    from pyspark.sql import functions as F

    from tubes_spark.sink import Sink

    g = str(tmp_path / "grp")
    _write_group_epochs(
        spark, g, [spark.range(0, 12).withColumn("u", F.col("id") % 3)]
    )

    real_replace = _os.replace
    def crashing_replace(src, dst):
        if "_compacted" in str(dst):
            raise RuntimeError("injected crash at the marker")
        return real_replace(src, dst)

    import tubes_spark.sink as sinkmod
    monkeypatch.setattr(sinkmod.os, "replace", crashing_replace)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="injected"):
        Sink.delete_rows_atomic(spark, g, "u = 1")
    monkeypatch.setattr(sinkmod.os, "replace", real_replace)

    # torn delete is invisible
    assert Sink.read_atomic_group(spark, g, "a").count() == 12
    # rerun completes and sweeps the dead dir
    n = Sink.delete_rows_atomic(spark, g, "u = 1")
    assert n["a"] == 4
    assert Sink.read_atomic_group(spark, g, "a").count() == 8


def test_delete_rows_atomic_per_leaf_predicates_and_later_epochs(spark, tmp_path):
    """Per-leaf predicates apply independently; an epoch committed
    AFTER the delete is untouched by it (documented bound)."""
    from pyspark.sql import functions as F

    from tubes_spark.sink import _CURRENT_EPOCH, Sink

    g = str(tmp_path / "grp")
    sink = _write_group_epochs(
        spark, g, [spark.range(0, 10).withColumn("u", F.col("id") % 4)]
    )
    n = Sink.delete_rows_atomic(spark, g, {"a": "u = 0", "b": "u = 1"})
    assert n["a"] == 3 and n["b"] == 3  # u=0: ids 0,4,8; u=1: ids 1,5,9
    assert all(r.u != 0 for r in Sink.read_atomic_group(spark, g, "a").collect())
    assert all(r.u != 1 for r in Sink.read_atomic_group(spark, g, "b").collect())

    token = _CURRENT_EPOCH.set(1)
    try:
        sink(spark.range(100, 104).withColumn("u", F.col("id") % 4))
    finally:
        _CURRENT_EPOCH.reset(token)
    a = Sink.read_atomic_group(spark, g, "a")
    assert a.filter("id >= 100").count() == 4  # new epoch unaffected


def test_read_atomic_latest_and_compact_to_latest(spark, tmp_path):
    """Latest-wins resolution, tombstone deletes, CoW equivalence, and
    the documented forfeit of pre-compaction versions."""
    from pyspark.sql import functions as F

    from tubes_spark.sink import _CURRENT_EPOCH, Sink

    g = str(tmp_path / "grp")
    sink = Sink.atomic_parquet_group(g, {"s": None})

    def write(ep, rows):
        df = spark.createDataFrame(rows, "k long, v long, deleted boolean")
        token = _CURRENT_EPOCH.set(ep)
        try:
            sink(df)
        finally:
            _CURRENT_EPOCH.reset(token)

    write(0, [(1, 10, False), (2, 20, False), (3, 30, False)])
    write(1, [(2, 21, False), (3, 31, True), (4, 40, False)])  # upd/del/ins

    latest = Sink.read_atomic_latest(spark, g, "s", ["k"], tombstone="deleted")
    got = {r.k: (r.v, r.epoch) for r in latest.collect()}
    assert got == {1: (10, 0), 2: (21, 1), 4: (40, 1)}

    # without the tombstone filter the deleted key's latest row is visible
    raw_latest = Sink.read_atomic_latest(spark, g, "s", ["k"])
    assert {r.k for r in raw_latest.collect()} == {1, 2, 3, 4}

    kept = Sink.compact_to_latest(spark, g, ["k"], tombstone="deleted")
    assert kept == {"s": 3}
    after = Sink.read_atomic_group(spark, g, "s")
    assert {r.k: (r.v, r.epoch) for r in after.collect()} == got
    # superseded version (k=2, v=20) is physically gone
    import glob

    import duckdb

    con = duckdb.connect()
    for f in glob.glob(f"{g}/**/*.parquet", recursive=True):
        assert (
            con.execute(
                f"SELECT count(*) FROM read_parquet('{f}') WHERE k = 2 AND v = 20"
            ).fetchone()[0]
            == 0
        ), f
    con.close()
    # pre-compaction time travel is forfeited: as-of 0 now shows only
    # surviving epoch-0 rows (k=1), not the superseded k=2/k=3 versions
    asof0 = Sink.read_atomic_group(spark, g, "s", as_of_epoch=0)
    assert {r.k for r in asof0.collect()} == {1}


def test_read_atomic_group_schema_evolution(spark, tmp_path):
    """Additive evolution: a later epoch adds a column; evolve_schema
    reads fill old rows with NULL, the default keeps the pre-evolution
    schema (new column invisible, no surprise NULLs), and a latest-wins
    compaction bakes the merged schema in."""
    from pyspark.sql import functions as F

    from tubes_spark.sink import _CURRENT_EPOCH, Sink

    g = str(tmp_path / "grp")
    sink = Sink.atomic_parquet_group(g, {"s": None})

    def write(ep, df):
        token = _CURRENT_EPOCH.set(ep)
        try:
            sink(df)
        finally:
            _CURRENT_EPOCH.reset(token)

    write(0, spark.createDataFrame([(1, 10)], "k long, v long"))
    write(1, spark.createDataFrame([(2, 20, "en")], "k long, v long, lang string"))

    evolved = Sink.read_atomic_group(spark, g, "s", evolve_schema=True)
    got = {r.k: (r.v, r.lang) for r in evolved.collect()}
    assert got == {1: (10, None), 2: (20, "en")}

    # default read: pre-evolution consumers keep their schema
    strict = Sink.read_atomic_group(spark, g, "s")
    assert "lang" not in strict.columns
    assert {r.k for r in strict.collect()} == {1, 2}

    # after evolution, an evolve-aware compaction bakes the merged
    # schema into the consolidated layout; plain reads then see it
    Sink.compact_to_latest(spark, g, ["k"], evolve_schema=True)
    after = Sink.read_atomic_group(spark, g, "s")
    assert {r.k: (r.v, r.lang) for r in after.collect()} == got


def test_dp_noisy_counts_mechanism_invariants(spark):
    """released = true + noise exactly; epsilon/sensitivity constant;
    noise is Laplace-shaped (signed, unbounded-ish but finite here)."""
    from tubes_spark import queries as Q

    rows = Q.dp_noisy_group_counts(spark, SF_SMALL).collect()
    assert len(rows) == 5
    for r in rows:
        assert abs(r.released_count - round(r.n_user_days + r.laplace_noise, 6)) < 1e-9
        assert r.epsilon_spent == 0.5 and r.sensitivity == 1
        # Laplace(2) noise: |x| beyond 40 has probability ~e^-20
        assert abs(r.laplace_noise) < 40.0
    assert any(r.laplace_noise < 0 for r in rows) or any(
        r.laplace_noise > 0 for r in rows
    )


def test_bootstrap_poisson_ci_invariants(spark):
    """CI bounds ordered, point estimate finite, every source present,
    and the interval is non-degenerate somewhere (B=32 replicas over
    500 docs must show sampling variation)."""
    from tubes_spark import queries as Q

    rows = Q.bootstrap_poisson_ci(spark, SF_SMALL).collect()
    assert len(rows) == 20  # sources at sf0.001
    nondegenerate = 0
    for r in rows:
        assert r.ci_lo <= r.ci_hi
        assert r.b_reps == 32
        assert r.point_mean > 0
        if r.ci_hi > r.ci_lo:
            nondegenerate += 1
    assert nondegenerate >= 15


def test_record_linkage_block_cap_fires_and_keeps_recall(spark, tmp_path):
    """Adversarial block: 500 customers share one (nation, segment,
    name-suffix) block, so the _LINK_CAP stable-prefix split MUST fire
    (block ~750 records > 200).  Under the fired cap (1) the engines
    still hash-agree (the oracle carries the identical split), and
    (2) every dirty variant still relinks to its base — the split key
    is the md5 of the name prefix the dirty perturbation never
    touches."""
    import duckdb
    import pandas as pd

    from tests.oracle_harness import _norm
    from tubes_spark import queries
    from tubes_spark.oracles import ORACLES

    cust = pd.DataFrame(
        {
            "c_custkey": [100 * i + 7 for i in range(500)],
            "c_name": [f"Customer#{100 * i + 7:09d}" for i in range(500)],
            "c_nationkey": [0] * 500,
            "c_acctbal": [float(i) * 3.0 for i in range(500)],
            "c_mktsegment": ["BUILDING"] * 500,
        }
    )
    assert len(set(n[16:18] for n in cust.c_name)) == 1  # one suffix block
    sf = tmp_path / "sf"
    sf.mkdir()
    cust.to_parquet(sf / "customer.parquet")

    sp = queries.record_linkage_entities(spark, str(sf)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{sf / 'customer.parquet'}')"
    )
    du = con.execute(ORACLES["record_linkage_entities"]).fetchdf()
    con.close()
    a, b = _norm(sp), _norm(du)
    assert a.astype(str).equals(b.astype(str)), "hash parity under fired cap"

    # recall contract: no dirty-only entity, full conservation
    assert all(r.n_records > r.n_dirty for _, r in sp.iterrows() if r.n_dirty > 0)
    n_dirty_total = int(sp.n_dirty.sum())
    assert n_dirty_total > 0
    assert int(sp.n_records.sum()) == 500 + n_dirty_total


def test_compression_ratio_matches_pure_python(spark):
    """Rows-only battery twin: the Arrow-batched zlib ratios must equal
    a driver-side pure-python computation exactly, for every doc in the
    sf0.001 corpus."""
    import zlib

    import duckdb

    from tubes_spark import queries as Q

    got = {
        r.doc_id: (r.raw_len, r.deflate_len, r.ratio, r.band)
        for r in Q.compression_ratio_quality(spark, SF_SMALL).collect()
    }
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF_SMALL}/documents.parquet')"
    ).fetchall()
    con.close()
    assert len(got) == len(docs) > 0
    for doc_id, text in docs:
        raw = (text or "").encode("utf-8")
        comp = len(zlib.compress(raw, 6))
        ratio = round(comp / (len(raw) if len(raw) > 0 else 1), 6)
        band = (
            "repetitive" if ratio < 0.35
            else "high_entropy" if ratio > 0.95
            else "normal"
        )
        assert got[doc_id] == (len(raw), comp, ratio, band), doc_id
    # the signal is non-degenerate on the corpus
    assert len({v[3] for v in got.values()}) >= 2
