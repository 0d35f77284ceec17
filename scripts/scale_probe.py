#!/usr/bin/env python3
"""Empirical scale probe: does each headline operator family scale
~linearly when the fact tables grow 10x?

Builds a synthetic sf1.0-equivalent dataset by replicating the sf0.1
fact tables with key offsets (dimension tables and key relationships
preserved so joins stay valid):

* lineitem/orders: orderkeys offset per replica (custkey/partkey/
  suppkey unchanged -> dimension joins still resolve);
* events: event_id offset, SAME time window (10x per-hour density —
  the realistic way traffic grows);
* documents: doc_id offset, a per-replica suffix token appended (so
  replicas are NEAR-dups, not byte-dups — dedup structures see
  realistic banding pressure rather than a degenerate 10-deep bucket
  of identical texts — while token statistics stay ~identical);
* embeddings: vec_id offset, one per-replica dimension nudged so
  vectors are near-dup clusters.

The output dir contains MULTI-file parquet (one file per replica),
so scans parallelize the way a real corpus does — no _fan needed.

Prints one JSON line per query: sf0.1 best-of-2, synth best-of-2, and
the time ratio to compare against the 10x data ratio.  Writes
SCALE_PROBE.json at the repo root.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from tubes_spark.session import get_spark
from tubes_spark import queries as Q
from tubes_spark.catalog import TABLES, load_table

SF_BASE = "/root/testdata/sf0.1"
REPLICAS = 10

# operator families with an expected ~linear scaling shape; the
# superlinear-by-construction families (inverted-index cosine: work ~
# sum(df^2); brute-force knn pair stream) are probed separately below
LINEAR_QUERIES = [
    "flagship_pricing_summary",
    "q3_shipping_priority",
    "tumbling_hourly",
    "dedup_exact_docs",
    "dedup_minhash_survivors",
    "contiguous_global_ids",
    "shuffle_shards_manifest",
    "binned_interval_counts",
    "bpe_encode_corpus",
    # round 5c
    "span_scrub_exact_substrings",
    "pii_redaction_scrub",
    "repetition_signals",
    "inverted_index_postings",
    "retention_cohorts_weekly",
    "window_funcs_battery",
    "bm25_search_scores",
    "markov_event_transitions",
    # round 6
    "multimodal_png_ahash",        # per-row encode+decode: pure map
    "bucketed_dedup_enrich_join",  # bucketed write + banded joins
    "gopher_quality_flags",        # re-probed: alpha rule added
    "pipeline_curation_end_to_end",  # full curation DAG
    "tombstone_delete_propagation",  # broadcast anti-join + audit
    "session_dynamic_gap",           # per-row-gap session merge
    "temperature_mixture_sample",    # 5-row quota broadcast + rank
    # round 7
    "multimodal_jpeg_ahash",         # per-row JPEG entropy roundtrip: pure map
    "dedup_minhash_arith_cc_survivors",  # bands -> star edges -> CC
    # round 8
    "url_canonical_dedup",           # regexp chain + one canonical-url agg
    "dedup_cc_best_quality_survivors",  # CC + partial-agg argmax survivor
    "ccnet_rarity_buckets",          # vocab rank broadcast + per-lang ntile
    "domain_mixture_weights",        # one domain agg + broadcast total
    "dedup_span_coverage",           # gram groupBy + hinted join + per-doc windows
    "dedup_span_rewrite",            # + covered-position explode + anti-join rebuild
    "quality_hashed_linear_score",   # pure-codegen hashed linear model
    "chunk_content_defined",         # CDC boundaries + chunk-hash share join
    "pipeline_stage_memoized",       # fingerprint scan + dedup stage + reread
    # round 9
    "rag_hybrid_rrf",                # 6-term index probes + rank fusion
    "lm_stupid_backoff_filter",      # count-table joins on the bigram key
    "layout_zorder_skipping",        # integer bit codegen + 64-row zone maps
    "retrieval_eval_metrics",        # top-20 legs + one narrow label agg
    "gdpr_delete_roundtrip",         # per-leaf filtered rewrite + marker
    "cdc_upsert_roundtrip",          # epoch append + key window + CoW
    "bootstrap_poisson_ci",          # B*n narrow explode + (source,b) agg
    "retrieval_hard_negatives",      # ranked-leg reuse + top-k window
    "psi_drift_monitor",             # one (type, period, bin) agg pass
    "pit_feature_join",              # two union/window as-of passes
    "compression_ratio_quality",     # embarrassingly parallel Arrow map
    # record_linkage_entities / k_anonymity_generalize /
    # l_diversity_audit read the customer dim, which full runs pin at
    # base scale; --only runs naming them OPT IN to a key-remapped 10x
    # customer (c_name layout preserved), so their rows measure a
    # genuinely grown input without moving the fact-family baselines.
    "record_linkage_entities",       # blocked fuzzy linkage + CC closure
    "k_anonymity_generalize",        # one scan + three conditional windows
    "l_diversity_audit",             # release CTE + one audit aggregation
    # round 10
    "dedup_incremental_minhash",     # batch-side signatures + left_semi vs stored index
    "streaming_dedup_incremental_minhash",  # 3 triggers of the same loop
    "orc_format_roundtrip",          # per-row codec + doc_id reconcile join
    # round 11
    "streaming_dedup_incremental_survivors",  # survivor-anchored index policy
]
SUPERLINEAR_QUERIES = [
    # documented quadratic-in-df / pair-stream families — reported, not
    # held to the linear bar
    "ngram_cosine_top_pairs",
    "knn_bruteforce",
    # candidate pairs grow ~replica^2 within each near-dup clone family
    # on THIS synth corpus (every doc gains 9 deliberate near-dups), so
    # the verify stage is quadratic by data design, not by plan
    "minhash_estimate_error",
    "jaccard_exact_prefix_join",
    # per-source signature clusters grow 10x on the replicated corpus,
    # so within-cluster candidate pairs grow ~100x by data design (the
    # cap bounds the JOIN's per-bucket cost, not the true-pair volume)
    "simhash_band_cap_stats",
]

# heavy north-star families probed at 100x (--x100-heavy / --x100-only):
# what each one's 100x cost measures
HEAVY_NOTES = {
    "dedup_minhash_survivors":
        "banded LSH: in-family candidates grow ~replicas^2 on "
        "this synth (every doc gains 99 near-dups)",
    "dedup_minhash_arith_cc_survivors":
        "bands -> star edges -> CC closure under the same "
        "candidate growth",
    "dedup_incremental_minhash":
        "index REBUILD dominates here (bucketed write at 100x); the "
        "fixed-batch read-side story is the index_age probe",
    "bpe_encode_corpus":
        "train_sample=20000 bounds merge training; encode is per-row",
    "jaccard_exact_prefix_join":
        "prefix-filtered verification: candidate pairs are the "
        "cost driver",
    "knn_ivf_distributed":
        "8 k-means iterations + cell-bucketed search at 100x "
        "corpus (cell-size skew is the risk)",
    "bucketed_dedup_enrich_join":
        "re-run after corpus-sized buckets + one-file-per-"
        "bucket write (r7: fixed-8 buckets, 35.9x)",
    "record_linkage_entities":
        "blocked linkage at 100x customers: ~120 records/block -> "
        "O(block^2) pair growth inside fixed 12.5k blocks; the "
        "_LINK_CAP split bounds the adversarial tail",
    "dedup_span_rewrite":
        "ExactSubstr scrub at maximal duplication pressure: "
        "every gram is duplicated on this synth, so hit/"
        "covered-position volume == corpus token volume — the "
        "worst case a near-dup-saturated crawl presents",
}


def build_synth(spark, out_dir: str, replicas: int = REPLICAS,
                only: "set[str] | None" = None) -> None:
    """``only`` restricts the replicated FACT tables (dims are always
    copied, they're tiny) — the heavy-family probe needs documents/
    embeddings at 100x but not a 60M-row lineitem it never reads."""
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    base = {t: load_table(spark, t, SF_BASE) for t in TABLES}
    # customer is normally a base-scale dim; amplifying it is OPT-IN
    # (only={"customer", ...}) so the established fact-family baselines
    # (q3 etc.) never silently change shape underneath their history.
    amp_customer = only is not None and "customer" in only
    for t in ("region", "nation", "supplier", "part") + (
        () if amp_customer else ("customer",)
    ):
        base[t].write.parquet(f"{out_dir}/{t}.parquet")

    def amplified(t, fn):
        if only is not None and t not in only:
            return
        parts = [fn(base[t], r) for r in range(replicas)]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        # multi-file layout: scans parallelize the way a real corpus does
        df.repartition(min(replicas * 4, 400)).write.parquet(f"{out_dir}/{t}.parquet")

    OK = 10_000_000_000
    if amp_customer:
        # key remap stays within 9 digits so c_name keeps the exact
        # 'Customer#%09d' 18-char layout record_linkage's positional
        # digit logic depends on (max base custkey 15k; r*100000 + k
        # <= 1.015M at 10x)
        parts = [
            base["customer"]
            .withColumn("c_custkey", F.col("c_custkey") + F.lit(r * 100_000))
            .withColumn(
                "c_name",
                F.concat(
                    F.lit("Customer#"),
                    F.lpad(F.col("c_custkey").cast("string"), 9, "0"),
                ),
            )
            for r in range(replicas)
        ]
        df = parts[0]
        for p_ in parts[1:]:
            df = df.unionByName(p_)
        df.repartition(min(replicas * 4, 400)).write.parquet(
            f"{out_dir}/customer.parquet"
        )
    amplified("orders", lambda d, r: d.withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(r * OK)))
    amplified("lineitem", lambda d, r: d.withColumn(
        "l_orderkey", F.col("l_orderkey") + F.lit(r * OK)))
    amplified("events", lambda d, r: d.withColumn(
        "event_id", F.col("event_id") + F.lit(r * OK)))
    amplified("documents", lambda d, r: d
              .withColumn("doc_id", F.col("doc_id") + F.lit(r * OK))
              .withColumn("text", F.concat(F.col("text"), F.lit(f" rep{r}")))
              .withColumn("n_chars", F.col("n_chars") + F.lit(len(f" rep{r}"))))
    amplified("embeddings", lambda d, r: d
              .withColumn("vec_id", F.col("vec_id") + F.lit(r * OK))
              .withColumn("embedding", F.transform(
                  "embedding",
                  lambda x, i: F.when(i == r % 64, x + F.lit(0.25)).otherwise(x))))


def skew_probe(spark) -> dict:
    """Deliberately Zipf-skewed JOIN: salted vs unsalted vs AQE-native.

    The uniform-key families above never stress the hot-reducer path,
    so this builds one that does: a 32M-row fact stream whose key
    follows a power law (hottest key ~32% of ALL rows), joined to a
    10k-row dimension with broadcasting disabled — the 100 TB shape
    where the dim side outgrows executor memory and the join must
    shuffle on the skewed key.  Three measurements:

    * unsalted, AQE off  — the naive plan: the hot key's rows funnel
      into one reducer (the straggler bound is the hot-key share);
    * salted  (operators/skew.py::salted_broadcast_left, 16 salts),
      AQE off — every (key, salt) bucket is bounded at hot/16;
    * unsalted, AQE on   — Spark's runtime skew-split, the engine-
      native mitigation the repo defaults to.

    PASS = the salted time is bounded near the uniform cost while the
    unsalted AQE-off time shows the straggler.  Measured nuance worth
    keeping: AQE's skew split only fires when the hot partition tops
    spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes (256MB
    default), so at probe scale AQE barely helps — explicit salting is
    the mitigation that works at every scale, AQE the free one at
    cluster scale."""
    from tubes_spark.operators.skew import salted_broadcast_left

    K, N = 10_000, 32_000_000  # hot task ~7M rows vs 500k avg: straggler-bound
    u = (F.pmod(F.xxhash64(F.col("id")), F.lit(1_000_000)) + 0.5) / 1_000_000.0
    # inverse-power-law map: P(k=0) = (1/K)^(1/8) ~ 31.6% of all rows
    fact = (
        spark.range(N)
        .select(
            F.floor(F.pow(u, 8.0) * K).cast("long").alias("k"),
            (F.col("id") % 997).alias("payload"),
        )
        .repartition(64)
        .localCheckpoint(eager=True)  # pin: measure the JOIN, not the synth
    )
    dim = (
        spark.range(K)
        .select(F.col("id").alias("k"), (F.col("id") % 31 + 1).alias("w"))
        .localCheckpoint(eager=True)
    )
    hot_share = fact.filter(F.col("k") == 0).count() / N

    TUNED = {
        # the probe's hot partition is ~7M rows x ~16B ~ 100-200MB —
        # under the 256MB default threshold, so default AQE never
        # splits it.  A cluster-scale hot partition is GBs; to observe
        # the engine's split behavior at probe scale, scale the
        # thresholds down by the same factor instead of the data up.
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8MB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4MB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }

    def run_join(salted: bool, aqe: bool, tuned: bool = False):
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        if tuned:
            for k, v in TUNED.items():
                spark.conf.set(k, v)
        try:
            best, fired = float("inf"), False
            for _ in range(2):
                j = (
                    salted_broadcast_left(fact, dim, ["k"], n_salts=16)
                    if salted
                    else fact.join(dim, "k")
                )
                agg = j.groupBy().agg(F.sum(F.col("payload") * F.col("w")))
                t0 = time.perf_counter()
                agg.collect()
                best = min(best, time.perf_counter() - t0)
                # plan evidence: AQE marks a split sort-merge join with
                # skew=true in the final (adaptive) executed plan
                plan = agg._jdf.queryExecution().executedPlan().toString()
                fired = fired or ("skew=true" in plan)
            return round(best, 3), fired
        finally:
            spark.conf.unset("spark.sql.adaptive.enabled")
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            for k in TUNED:
                spark.conf.unset(k)

    naive, _ = run_join(salted=False, aqe=False)
    salted, _ = run_join(salted=True, aqe=False)
    aqe_def, def_fired = run_join(salted=False, aqe=True)
    aqe_tuned, tuned_fired = run_join(salted=False, aqe=True, tuned=True)
    res = {
        "rows": N,
        "keys": K,
        "hot_key_share": round(hot_share, 4),
        "unsalted_aqe_off_sec": naive,
        "salted_aqe_off_sec": salted,
        "unsalted_aqe_on_sec": aqe_def,
        "aqe_default_skew_fired": def_fired,
        "unsalted_aqe_tuned_sec": aqe_tuned,
        "aqe_tuned_skew_fired": tuned_fired,
        "aqe_tuned_conf": TUNED,
    }
    res["salting_speedup_vs_naive"] = round(naive / salted, 2)
    res["aqe_tuned_speedup_vs_naive"] = round(naive / aqe_tuned, 2)
    res["note"] = (
        "salting works at every scale; default AQE stays under its 256MB "
        "threshold at probe scale, the tuned thresholds make the engine's "
        "skew split observable (skew=true in the adaptive plan)"
    )
    return res


def force(df) -> None:
    """Materialize EVERY column of every row (noop datasource write).

    r13: probing a screen with ``.count()`` is wrong for the ANN
    verdict ledger — it ends in a left join against a per-key
    aggregate, whose keys Catalyst knows are distinct, so a count
    ELIMINATES the join and the probe times directory listing instead
    of the screen (caught via REST stage metrics: 0.02 MB input for a
    33 MB index).  The MinHash verdicts end in an anti-join (count-
    relevant, not eliminable), so their probe rows were always real.
    Every probe that times a screen goes through this now."""
    df.write.format("noop").mode("overwrite").save()


def best_of(fn, spark, sf_dir, n=2) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def calibrate(spark) -> float:
    """Host-noise index: the flagship query best-of-3 at the base SF —
    the same probe bench.py records (VERDICT-r8 #3b).  Heavy-probe
    numbers have swung 3x across same-code runs on this shared host;
    a calibration value on every probe run makes the swings
    normalizable instead of mysterious."""
    return best_of(Q.flagship_pricing_summary, spark, SF_BASE, n=3)


# graph-structure queries derive a session-cached shared structure, so a
# naive best-of-2 at the base SF measures the cached MARGINAL while the
# synth side pays the build — an apples-to-oranges ratio (VERDICT-r8 #3a:
# ngram_cosine_top_pairs "40.7x" was exactly this).  Probe them as
# {cold, marginal} pairs on BOTH sides and ratio like-to-like.
GRAPH_PROBE = {
    "ngram_cosine_top_pairs",
    "doc_centrality_pagerank",
    "graph_triangle_rare_shingles",
    "graph_bfs_hops",
}


def cold_and_marginal(fn, spark, sf_dir) -> "tuple[float, float]":
    from tubes_spark.queries import clear_derived_cache

    fn(spark, sf_dir).count()  # one throwaway: bill codegen to nobody
    clear_derived_cache()
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()  # cold: pays the structure build
    cold = round(time.perf_counter() - t0, 3)
    marginal = best_of(fn, spark, sf_dir, n=2)  # structure now cached
    return cold, marginal


def main() -> None:
    out_dir = os.environ.get("SCALE_PROBE_DIR", "/tmp/tubes_scale_probe")
    spark = get_spark("tubes_scale_probe", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    probe_path = Path(__file__).resolve().parent.parent / "SCALE_PROBE.json"

    if "--only" in sys.argv:
        # incremental 10x probe of a named subset (new families land
        # here without a full refresh); merges into results with a run
        # stamp.  Replicates the corpus-side fact tables (documents/
        # embeddings/events); dims stay base-scale BY DESIGN, so
        # dim-input families (record_linkage_entities,
        # k_anonymity_generalize) go through the full run instead.
        names = sys.argv[sys.argv.index("--only") + 1].split(",")
        run_id = time.strftime("%Y-%m-%dT%H:%M:%S")
        t0 = time.time()
        synth_tables = {"documents", "embeddings", "events"}
        if {"record_linkage_entities", "k_anonymity_generalize",
            "l_diversity_audit"} & set(names):
            synth_tables |= {"customer", "orders"}
        build_synth(spark, out_dir, only=synth_tables)
        print(f"# synth build: {time.time()-t0:.1f}s", file=sys.stderr)
        payload = json.loads(probe_path.read_text()) if probe_path.exists() else {}
        for name in names:
            fn = getattr(Q, name)
            if name in GRAPH_PROBE:
                # like-to-like cold/marginal pairs — the same discipline
                # the full run applies (VERDICT-r9 #4: the --only path
                # previously re-wrote graph rows in the stale
                # cached-marginal-vs-cold shape)
                s_cold, s_marg = cold_and_marginal(fn, spark, SF_BASE)
                b_cold, b_marg = cold_and_marginal(fn, spark, out_dir)
                row = {
                    "sf0_1": {"cold": s_cold, "marginal": s_marg},
                    "x10": {"cold": b_cold, "marginal": b_marg},
                    "time_ratio_cold": round(b_cold / s_cold, 2) if s_cold > 0 else None,
                    "time_ratio_marginal": round(b_marg / s_marg, 2) if s_marg > 0 else None,
                    "expected": "linear(<=10x)" if name in LINEAR_QUERIES
                    else "superlinear-by-construction",
                    "run": run_id,
                }
            else:
                small = best_of(fn, spark, SF_BASE)
                big = best_of(fn, spark, out_dir)
                row = {
                    "sf0_1_sec": small,
                    "x10_sec": big,
                    "time_ratio": round(big / small, 2) if small > 0 else None,
                    "expected": "linear(<=10x)" if name in LINEAR_QUERIES
                    else "superlinear-by-construction",
                    "run": run_id,
                }
            payload.setdefault("results", {})[name] = row
            print(json.dumps({"query": name, **row}))
            probe_path.write_text(json.dumps(payload, indent=1) + "\n")
        spark.stop()
        return

    if "--index-age" in sys.argv:
        # VERDICT-r10 #7: the bucketed-index probe the layout exists
        # for — the INDEX is 100x (many committed epochs, the daily-
        # crawl accumulation pattern), the ARRIVING batch is fixed.
        # Rows: bucketed layout at age 1x and age 100x (20 live epochs
        # AND after compaction), plus the pre-r11 LEGACY layout at age
        # 100x (plain parquet group, read-side shuffle + distinct) as
        # the baseline the layout replaces.  Fresh session per
        # measurement (r9 heavy-probe discipline).
        from tubes_spark.operators import dedup as D
        from tubes_spark.sink import Sink, _CURRENT_EPOCH

        run_id = time.strftime("%Y-%m-%dT%H:%M:%S")
        payload = json.loads(probe_path.read_text()) if probe_path.exists() else {}
        ia_dir = os.environ.get("SCALE_PROBE_IDXAGE_DIR", "/tmp/tubes_scale_idxage")
        shutil.rmtree(ia_dir, ignore_errors=True)
        os.makedirs(ia_dir)
        OK = 10_000_000_000

        def rep(d, r):
            return (d.withColumn("doc_id", F.col("doc_id") + F.lit(r * OK))
                    .withColumn("text", F.concat(F.col("text"), F.lit(f" rep{r}"))))

        docs = load_table(spark, "documents", SF_BASE).select("doc_id", "text")
        # fixed arriving batch: every 10th base doc (500 at sf0.1),
        # ids remapped clear of every index replica band
        batch_path = f"{ia_dir}/batch.parquet"
        (docs.filter(F.col("doc_id") % 10 == 0)
         .withColumn("doc_id", F.col("doc_id") + F.lit(999 * OK))
         .write.parquet(batch_path))

        t0 = time.time()
        idx1 = f"{ia_dir}/idx_age1"
        D.write_minhash_index(rep(docs, 0), idx1, epoch=0)
        idx100 = f"{ia_dir}/idx_age100"
        for e in range(20):
            parts = [rep(docs, 5 * e + i) for i in range(5)]
            ep_df = parts[0]
            for p_ in parts[1:]:
                ep_df = ep_df.unionByName(p_)
            D.write_minhash_index(ep_df, idx100, epoch=e)
        idx100c = f"{ia_dir}/idx_age100_compacted"
        shutil.copytree(idx100, idx100c)
        D.compact_minhash_index(spark, idx100c)  # shipped maintenance: consolidate + key-dedupe + gc
        # legacy pre-r11 layout at the same 100x age: raw band rows,
        # no spec -> incremental_minhash_new takes the fallback path
        idxleg = f"{ia_dir}/idx_age100_legacy"
        all_parts = [rep(docs, r) for r in range(100)]
        all_df = all_parts[0]
        for p_ in all_parts[1:]:
            all_df = all_df.unionByName(p_)
        leg_sink = Sink.atomic_parquet_group(idxleg, {"bands": None})
        tok = _CURRENT_EPOCH.set(0)
        try:
            leg_sink(D.arith_minhash_bands(all_df))
        finally:
            _CURRENT_EPOCH.reset(tok)
        print(f"# index-age build: {time.time()-t0:.1f}s", file=sys.stderr)

        rows = {}
        cal_start = calibrate(spark)
        for tag, gdir in [("bucketed_age1", idx1),
                          ("bucketed_age100_live20", idx100),
                          ("bucketed_age100_compacted", idx100c),
                          ("legacy_age100", idxleg)]:
            spark.stop()
            spark = get_spark("tubes_idxage", shuffle_partitions=64)
            spark.sparkContext.setLogLevel("ERROR")
            b = spark.read.parquet(batch_path)
            t0 = time.perf_counter()
            D.incremental_minhash_new(b, spark, gdir).count()
            cold = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            D.incremental_minhash_new(b, spark, gdir).count()
            warm = round(time.perf_counter() - t0, 3)
            rows[tag] = {"cold": cold, "warm": warm}
            print(json.dumps({"index_age": tag, **rows[tag]}))
        a1, a100 = rows["bucketed_age1"], rows["bucketed_age100_compacted"]
        payload["index_age"] = {
            "base": SF_BASE, "index_replicas": 100, "batch_rows": 500,
            "results": rows,
            "age_ratio_cold_bucketed_compacted": round(a100["cold"] / a1["cold"], 2),
            "legacy_over_bucketed_cold": round(
                rows["legacy_age100"]["cold"]
                / rows["bucketed_age100_compacted"]["cold"], 2),
            "calibration": {"start": cal_start, "end": calibrate(spark)},
            "run": run_id,
        }
        probe_path.write_text(json.dumps(payload, indent=1) + "\n")
        spark.stop()
        shutil.rmtree(ia_dir, ignore_errors=True)
        return

    if "--index-maint" in sys.argv:
        # r11 self-maintenance probe: 20 daily batches ingested through
        # incremental_minhash_new(update_index=True), once with
        # compact_after=5 and once with no maintenance.  Per-batch wall
        # time INCLUDES the epoch append and (auto path) any compaction
        # that batch triggers — the honest daily cost a corpus owner
        # pays.  The claim under test: the maintained index's per-batch
        # cost stays flat (sawtooth at each rewrite) while the
        # unmaintained one grows with epoch fan-in.
        from tubes_spark.operators import dedup as D

        run_id = time.strftime("%Y-%m-%dT%H:%M:%S")
        payload = json.loads(probe_path.read_text()) if probe_path.exists() else {}
        im_dir = os.environ.get("SCALE_PROBE_IDXMAINT_DIR", "/tmp/tubes_scale_idxmaint")
        shutil.rmtree(im_dir, ignore_errors=True)
        os.makedirs(im_dir)
        OK = 10_000_000_000
        docs = load_table(spark, "documents", SF_BASE).select("doc_id", "text")
        sub = docs.filter(F.col("doc_id") % 10 == 0)  # 500 docs at sf0.1

        def rep(r):
            return (sub.withColumn("doc_id", F.col("doc_id") + F.lit(r * OK))
                    .withColumn("text", F.concat(F.col("text"), F.lit(f" rep{r}"))))

        cal_start = calibrate(spark)
        auto, plain = f"{im_dir}/auto", f"{im_dir}/plain"
        for idx in (auto, plain):
            D.write_minhash_index(rep(0), idx, epoch=0)
        secs = {"auto": [], "plain": []}
        kept = {"auto": [], "plain": []}
        for r in range(1, 21):
            b = rep(r).localCheckpoint(eager=True)  # bill batch prep to nobody
            for tag, idx in (("auto", auto), ("plain", plain)):
                kw = {"compact_after": 5} if tag == "auto" else {}
                t0 = time.perf_counter()
                n = D.incremental_minhash_new(
                    b, spark, idx, update_index=True, **kw
                ).count()
                secs[tag].append(round(time.perf_counter() - t0, 3))
                kept[tag].append(n)
            print(json.dumps({"index_maint_batch": r,
                              "auto": secs["auto"][-1],
                              "plain": secs["plain"][-1]}))
        assert kept["auto"] == kept["plain"], "maintenance changed decisions"

        def live_dirs(idx):
            d = f"{idx}/bands/data"
            return len([x for x in os.listdir(d) if not x.startswith(".")]) \
                if os.path.isdir(d) else 0

        last5 = lambda xs: round(sum(xs[-5:]) / 5, 3)
        payload["index_maint"] = {
            "base": SF_BASE, "batches": 20, "batch_rows": 500,
            "compact_after": 5,
            "per_batch_sec": secs,
            "last5_mean": {"auto": last5(secs["auto"]),
                           "plain": last5(secs["plain"])},
            "plain_over_auto_last5": round(
                last5(secs["plain"]) / last5(secs["auto"]), 2),
            "live_epoch_dirs_end": {"auto": live_dirs(auto),
                                    "plain": live_dirs(plain)},
            "decisions_identical": True,
            "calibration": {"start": cal_start, "end": calibrate(spark)},
            "run": run_id,
        }
        probe_path.write_text(json.dumps(payload, indent=1) + "\n")
        print(json.dumps({"index_maint": payload["index_maint"]["last5_mean"],
                          "ratio": payload["index_maint"]["plain_over_auto_last5"]}))
        spark.stop()
        shutil.rmtree(im_dir, ignore_errors=True)
        return

    if "--ann-index-age" in sys.argv:
        # VERDICT-r11 #5: the vector-index sibling of .index_age — the
        # cells INDEX ages 100x (20 committed epochs x 5 replica waves,
        # the daily-ingest accumulation pattern), the ARRIVING batch is
        # fixed.  Rows mirror the MinHash methodology exactly: bucketed
        # at age 1x, age 100x live-20-dirs, age 100x compacted, and the
        # LEGACY plain-parquet layout at age 100x.  Anchors are shared
        # across every index (one codebook via kmeans_anchors_decimal
        # on the base wave) so the within-cell screen work is identical
        # and the rows isolate pure LAYOUT cost.  Fresh session per
        # measurement (r9 heavy-probe discipline).
        from tubes_spark.operators import similarity as S
        from tubes_spark.sink import Sink, _CURRENT_EPOCH

        run_id = time.strftime("%Y-%m-%dT%H:%M:%S")
        payload = json.loads(probe_path.read_text()) if probe_path.exists() else {}
        ia_dir = os.environ.get("SCALE_PROBE_ANNAGE_DIR", "/tmp/tubes_scale_annage")
        shutil.rmtree(ia_dir, ignore_errors=True)
        os.makedirs(ia_dir)
        OK = 10_000_000_000

        vecs = (
            load_table(spark, "embeddings", SF_BASE)  # 2000 at sf0.1
            .select(
                "vec_id",
                F.transform("embedding", lambda x: x.cast("double")).alias(
                    "embedding"
                ),
            )
        )

        def rep(d, r):
            # offset ids and nudge one dimension per replica so stored
            # vectors are near-dup clusters, not byte-dups
            return d.withColumn("vec_id", F.col("vec_id") + F.lit(r * OK)).withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, i: F.when(
                        i == F.lit(r % 64), x + F.lit(0.001 * (r + 1))
                    ).otherwise(x),
                ),
            )

        anch = S.kmeans_anchors_decimal(vecs, n_anchors=16, iters=1)
        batch_path = f"{ia_dir}/batch.parquet"
        (vecs.filter(F.col("vec_id") % 80 == 0)  # 25 at sf0.1
         .withColumn("vec_id", F.col("vec_id") + F.lit(999 * OK))
         .write.parquet(batch_path))

        t0 = time.time()
        idx1 = f"{ia_dir}/idx_age1"
        S.write_ann_index(rep(vecs, 0), idx1, anchors=anch)
        idx100 = f"{ia_dir}/idx_age100"
        for e in range(20):
            parts = [rep(vecs, 5 * e + i) for i in range(5)]
            ep_df = parts[0]
            for p_ in parts[1:]:
                ep_df = ep_df.unionByName(p_)
            S.write_ann_index(ep_df, idx100, anchors=anch, epoch=e)
        idx100c = f"{ia_dir}/idx_age100_compacted"
        shutil.copytree(idx100, idx100c)
        Sink.compact_atomic_group(spark, idx100c, gc=True)
        # legacy pre-bucketed layout at the same 100x age: plain parquet
        # group, no _bucketspec -> incremental_ann_new takes the
        # fallback read (shuffle on both sides)
        idxleg = f"{ia_dir}/idx_age100_legacy"
        all_parts = [rep(vecs, r) for r in range(100)]
        all_df = all_parts[0]
        for p_ in all_parts[1:]:
            all_df = all_df.unionByName(p_)
        cells = S._with_cell(all_df, "embedding", anch).select(
            "vec_id", "cell", "embedding"
        )
        leg_sink = Sink.atomic_parquet_group(idxleg, {"cells": None})
        tok = _CURRENT_EPOCH.set(0)
        try:
            leg_sink(cells)
        finally:
            _CURRENT_EPOCH.reset(tok)
        shutil.copy(f"{idx1}/_anchors.parquet", f"{idxleg}/_anchors.parquet")
        print(f"# ann-index-age build: {time.time()-t0:.1f}s", file=sys.stderr)

        rows = {}
        cal_start = calibrate(spark)
        for tag, gdir in [("bucketed_age1", idx1),
                          ("bucketed_age100_live20", idx100),
                          ("bucketed_age100_compacted", idx100c),
                          ("legacy_age100", idxleg)]:
            spark.stop()
            spark = get_spark("tubes_annage", shuffle_partitions=64)
            spark.sparkContext.setLogLevel("ERROR")
            # measure the SMJ shape the join has at real scale: a 100 TB
            # index side never broadcasts, and at probe scale a
            # broadcast would bypass exactly the Exchange the layout
            # exists to eliminate (same discipline as the tests'
            # no_broadcast fixture)
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
            b = spark.read.parquet(batch_path)
            t0 = time.perf_counter()
            force(S.incremental_ann_new(b, spark, gdir, threshold=0.9))
            cold = round(time.perf_counter() - t0, 3)
            warm = float("inf")  # best-of-2: this host bursts
            for _ in range(2):
                t0 = time.perf_counter()
                force(S.incremental_ann_new(b, spark, gdir, threshold=0.9))
                warm = min(warm, round(time.perf_counter() - t0, 3))
            rows[tag] = {"cold": cold, "warm": warm}
            print(json.dumps({"ann_index_age": tag, **rows[tag]}))
        a1, a100 = rows["bucketed_age1"], rows["bucketed_age100_compacted"]
        payload["ann_index_age"] = {
            "base": SF_BASE, "index_replicas": 100, "batch_rows": 25,
            "index_rows": 200000, "n_anchors": 16, "results": rows,
            "age_ratio_cold_bucketed_compacted": round(a100["cold"] / a1["cold"], 2),
            "legacy_over_bucketed_cold": round(
                rows["legacy_age100"]["cold"]
                / rows["bucketed_age100_compacted"]["cold"], 2),
            "note": "within-cell screen work grows with stored rows by "
                    "design (the SemDeDup contract); all age-100 rows "
                    "pay it identically, so the layout ratios isolate "
                    "read-side fan-in. Anchor-count scaling is the "
                    "ann_anchor_scale probe. r13 restatement: screens "
                    "now run under noop-write materialization (prior "
                    "rounds' count() join-eliminated the ledger, timing "
                    "listing overhead only); the Exchange-elimination "
                    "claim is proven in shuffle BYTES by the "
                    "ann_age_shuffle probe (legacy shuffles the full "
                    "index, bucketed shuffles only the batch).",
            "calibration": {"start": cal_start, "end": calibrate(spark)},
            "run": run_id,
        }
        probe_path.write_text(json.dumps(payload, indent=1) + "\n")
        spark.stop()
        shutil.rmtree(ia_dir, ignore_errors=True)
        return

    if "--ann-anchor-scale" in sys.argv:
        # VERDICT-r11 #1 (probe): with anchors= the cell count can now
        # follow the corpus.  Candidate-pair law for a fixed arriving
        # batch: pairs/row ~ N/C, so freezing C=16 at 10x corpus pays
        # 10x pairs/row, C ~ sqrt(N) pays ~sqrt(10)x (~3.2x — the IVF
        # sizing rule), C ~ N holds it flat.  EXACT pair counts by cell
        # arithmetic (no screen run needed) + one wall-clock screen per
        # config as corroboration.
        from tubes_spark.operators import similarity as S

        run_id = time.strftime("%Y-%m-%dT%H:%M:%S")
        payload = json.loads(probe_path.read_text()) if probe_path.exists() else {}
        as_dir = os.environ.get("SCALE_PROBE_ANNSC_DIR", "/tmp/tubes_scale_annsc")
        OK = 10_000_000_000

        base = load_table(spark, "embeddings", SF_BASE).select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        )

        def rep(d, r):
            return d.withColumn("vec_id", F.col("vec_id") + F.lit(r * OK)).withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, i: F.when(
                        i == F.lit(r % 64), x + F.lit(0.001 * (r + 1))
                    ).otherwise(x),
                ),
            )

        big = rep(base, 0)
        for r in range(1, 10):
            big = big.unionByName(rep(base, r))
        big = big.localCheckpoint(eager=True)  # 10x corpus, built once
        batch = base.filter(F.col("vec_id") % 40 == 0).withColumn(
            "vec_id", F.col("vec_id") + F.lit(999 * OK)
        ).localCheckpoint(eager=True)

        def pair_stats(corpus, n_anchors, tag, train_iters=1):
            t0 = time.perf_counter()
            # kernel="auto": above the dispatch threshold the trainer
            # assigns through the broadcast matmul (r13) — the path a
            # real sqrt(N) codebook trains on; below it the bit-exact
            # expression kernel is unchanged
            anch = S.kmeans_anchors_decimal(
                corpus, n_anchors=n_anchors, iters=train_iters, kernel="auto"
            )
            train_s = round(time.perf_counter() - t0, 3)
            stored = (
                S._with_cell(corpus, "embedding", anch)
                .groupBy("cell").count().withColumnRenamed("count", "ns")
            )
            arriving = (
                S._with_cell(batch, "embedding", anch)
                .groupBy("cell").count().withColumnRenamed("count", "nb")
            )
            pairs = (
                stored.join(arriving, "cell")
                .select(F.sum(F.col("ns") * F.col("nb")).alias("p"))
                .collect()[0]["p"]
            ) or 0
            nb = batch.count()
            # corroborating wall-clock: one real screen over a fresh index
            shutil.rmtree(as_dir, ignore_errors=True)
            S.write_ann_index(corpus, as_dir, anchors=anch)
            t0 = time.perf_counter()
            force(S.incremental_ann_new(batch, spark, as_dir, threshold=0.9))
            screen_s = round(time.perf_counter() - t0, 3)
            shutil.rmtree(as_dir, ignore_errors=True)
            row = {
                "n_anchors": n_anchors, "pairs": int(pairs),
                "pairs_per_batch_row": round(pairs / nb, 1),
                "train_sec": train_s, "screen_sec": screen_s,
            }
            print(json.dumps({"ann_anchor_scale": tag, **row}))
            return row

        cal_start = calibrate(spark)
        rows = {
            "base_16": pair_stats(base, 16, "base_16"),
            "x10_frozen_16": pair_stats(big, 16, "x10_frozen_16"),
            "x10_sqrt_51": pair_stats(big, 51, "x10_sqrt_51"),
            "x10_linear_160": pair_stats(big, 160, "x10_linear_160"),
        }
        ppr = lambda k: rows[k]["pairs_per_batch_row"]
        payload["ann_anchor_scale"] = {
            "base": SF_BASE, "corpus_x": 10,
            "results": rows,
            "pairs_per_row_growth": {
                "frozen_16": round(ppr("x10_frozen_16") / ppr("base_16"), 2),
                "sqrt_51": round(ppr("x10_sqrt_51") / ppr("base_16"), 2),
                "linear_160": round(ppr("x10_linear_160") / ppr("base_16"), 2),
            },
            "law": "pairs/row ~ N/C: frozen anchors pay ~10x at 10x "
                   "corpus, C~sqrt(N) pays ~sqrt(10), C~N stays flat",
            "note": "r13 restatement: screen_sec now measures the FULL "
                    "screen (noop-write materialization — prior rounds' "
                    "count() let Catalyst eliminate the verdict ledger's "
                    "left join, timing dir listing instead); training and "
                    "screening above the kernel threshold (128 anchors) "
                    "dispatch to the broadcast-matmul kernel, so anchor "
                    "growth no longer pays superlinear plan cost — see "
                    "the ann_kernel probe",
            "calibration": {"start": cal_start, "end": calibrate(spark)},
            "run": run_id,
        }
        probe_path.write_text(json.dumps(payload, indent=1) + "\n")
        spark.stop()
        return

    if "--ann-age-shuffle" in sys.argv:
        # VERDICT-r12 #5: the ann_index_age probe honestly recorded
        # legacy ~= bucketed WALL-CLOCK at 100 MB — the saved
        # index-side Exchange is smaller than catalog overhead at that
        # size.  This probe proves the Exchange elimination in BYTES
        # rather than plan shape: the same aged-100x screen on both
        # layouts, with per-stage shuffle read/write totals scraped
        # from the Spark status REST API (UI enabled just for these
        # sessions).  The bucketed layout's shuffle traffic must be
        # O(batch) — independent of index size — while the legacy
        # layout shuffles the whole 200k-row index.
        import urllib.request

        from pyspark.sql import SparkSession

        from tubes_spark.operators import similarity as S
        from tubes_spark.sink import Sink, _CURRENT_EPOCH

        run_id = time.strftime("%Y-%m-%dT%H:%M:%S")
        payload = json.loads(probe_path.read_text()) if probe_path.exists() else {}
        ia_dir = os.environ.get("SCALE_PROBE_ANNSH_DIR", "/tmp/tubes_scale_annsh")
        shutil.rmtree(ia_dir, ignore_errors=True)
        os.makedirs(ia_dir)
        OK = 10_000_000_000

        vecs = load_table(spark, "embeddings", SF_BASE).select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        )

        def rep(d, r):
            return d.withColumn(
                "vec_id", F.col("vec_id") + F.lit(r * OK)
            ).withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, i: F.when(
                        i == F.lit(r % 64), x + F.lit(0.001 * (r + 1))
                    ).otherwise(x),
                ),
            )

        anch = S.kmeans_anchors_decimal(vecs, n_anchors=16, iters=1)
        batch_path = f"{ia_dir}/batch.parquet"
        (vecs.filter(F.col("vec_id") % 80 == 0)
         .withColumn("vec_id", F.col("vec_id") + F.lit(999 * OK))
         .write.parquet(batch_path))
        # aged bucketed index: 20 epochs x 5 waves, then compacted —
        # the steady state a maintained index lives in
        idxb = f"{ia_dir}/idx_bucketed"
        for e in range(20):
            parts = [rep(vecs, 5 * e + i) for i in range(5)]
            ep_df = parts[0]
            for p_ in parts[1:]:
                ep_df = ep_df.unionByName(p_)
            S.write_ann_index(ep_df, idxb, anchors=anch, epoch=e)
        Sink.compact_atomic_group(spark, idxb, gc=True)
        # legacy plain-parquet layout, same 100x content
        idxleg = f"{ia_dir}/idx_legacy"
        all_df = rep(vecs, 0)
        for r in range(1, 100):
            all_df = all_df.unionByName(rep(vecs, r))
        cells = S._with_cell(all_df, "embedding", anch).select(
            "vec_id", "cell", "embedding"
        )
        leg_sink = Sink.atomic_parquet_group(idxleg, {"cells": None})
        tok = _CURRENT_EPOCH.set(0)
        try:
            leg_sink(cells)
        finally:
            _CURRENT_EPOCH.reset(tok)
        shutil.copy(
            f"{idxb}/_anchors.parquet", f"{idxleg}/_anchors.parquet"
        )
        spark.stop()

        def rest_stages(sess, settle: bool = False):
            base_url = sess.sparkContext.uiWebUrl
            apps = json.loads(
                urllib.request.urlopen(f"{base_url}/api/v1/applications").read()
            )
            app_id = apps[0]["id"]

            def grab():
                return {
                    s["stageId"]: s
                    for s in json.loads(
                        urllib.request.urlopen(
                            f"{base_url}/api/v1/applications/{app_id}/stages"
                            "?status=complete"
                        ).read()
                    )
                }

            cur = grab()
            if settle:
                # the status store digests listener events ASYNC — poll
                # until the completed-stage set stops growing so a
                # snapshot right after an action misses nothing
                for _ in range(20):
                    time.sleep(0.5)
                    nxt = grab()
                    if set(nxt) == set(cur):
                        return nxt
                    cur = nxt
            return cur

        rows = {}
        for tag, gdir in [("bucketed_age100_compacted", idxb),
                          ("legacy_age100", idxleg)]:
            sess = (
                SparkSession.builder.appName("tubes_annsh")
                .master(f"local[{os.cpu_count()}]")
                .config("spark.sql.shuffle.partitions", "64")
                .config("spark.sql.adaptive.enabled", "true")
                .config("spark.sql.session.timeZone", "UTC")
                .config("spark.ui.enabled", "true")  # metrics source
                .config("spark.sql.autoBroadcastJoinThreshold", "-1")
                .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
                .getOrCreate()
            )
            sess.sparkContext.setLogLevel("ERROR")
            b = sess.read.parquet(batch_path)
            before = set(rest_stages(sess))
            # wall-clock and the REST byte totals must cover the SAME
            # window: the screen's eager assignment checkpoint runs
            # inside incremental_ann_new, so t0 starts before it, and
            # the row count moves AFTER the `after` snapshot so its
            # re-execution stages aren't attributed to the screen.
            t0 = time.perf_counter()
            out = S.incremental_ann_new(b, sess, gdir, threshold=0.9)
            force(out)
            wall = round(time.perf_counter() - t0, 3)
            after = rest_stages(sess, settle=True)
            n = out.count()
            new = [s for sid, s in after.items() if sid not in before]
            rows[tag] = {
                "verdict_rows": int(n),
                "wall_sec": wall,
                "stages": len(new),
                "shuffle_read_mb": round(
                    sum(s["shuffleReadBytes"] for s in new) / 1e6, 2
                ),
                "shuffle_write_mb": round(
                    sum(s["shuffleWriteBytes"] for s in new) / 1e6, 2
                ),
                "input_mb": round(sum(s["inputBytes"] for s in new) / 1e6, 2),
            }
            print(json.dumps({"ann_age_shuffle": tag, **rows[tag]}))
            sess.stop()
        leg, buc = rows["legacy_age100"], rows["bucketed_age100_compacted"]
        payload["ann_age_shuffle"] = {
            "base": SF_BASE, "index_replicas": 100, "batch_rows": 25,
            "index_rows": 200000, "n_anchors": 16,
            "results": rows,
            "legacy_over_bucketed_shuffle_write": round(
                leg["shuffle_write_mb"] / max(buc["shuffle_write_mb"], 0.01), 1
            ),
            "law": "the bucketed layout's shuffle traffic is O(batch) — "
                   "independent of index size — because the index side "
                   "never crosses an Exchange; the legacy layout "
                   "shuffles the full index through the join",
            "note": "r13 re-record: wall-clock and REST byte totals now "
                    "cover the same window (clock starts before the "
                    "screen's eager checkpoint; the row count runs after "
                    "the stage snapshot, so its re-execution is not "
                    "attributed to the screen)",
            "run": run_id,
        }
        probe_path.write_text(json.dumps(payload, indent=1) + "\n")
        shutil.rmtree(ia_dir, ignore_errors=True)
        return

    if "--ann-kernel" in sys.argv:
        # VERDICT-r12 #1 (probe): the broadcast-matmul assignment
        # kernel makes the sqrt(N) codebook law ACTIONABLE — the
        # expression kernel's cost is O(|anchors|) interpreted folds
        # per row (the ann_anchor_scale probe measured superlinear
        # wall-clock by 160 anchors), while the matmul kernel's cost
        # is one BLAS pass: ~linear in rows, near-flat in anchors
        # until FLOPs dominate.  Rows measured: vectorized at 1024
        # anchors across 1x/4x/16x corpus tiers (rows-linearity), both
        # kernels head-to-head at 160 anchors, vectorized at 4096
        # anchors (a real 100 TB codebook size), and a cell-parity
        # count at 160 anchors (same argmax from both kernels).
        from tubes_spark.operators import similarity as S

        run_id = time.strftime("%Y-%m-%dT%H:%M:%S")
        payload = json.loads(probe_path.read_text()) if probe_path.exists() else {}
        OK = 10_000_000_000

        base = load_table(spark, "embeddings", SF_BASE).select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        )

        def rep(d, r):
            return d.withColumn(
                "vec_id", F.col("vec_id") + F.lit(r * OK)
            ).withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, i: F.when(
                        i == F.lit(r % 64), x + F.lit(0.001 * (r + 1))
                    ).otherwise(x),
                ),
            )

        def tier(x):
            big = rep(base, 0)
            for r in range(1, x):
                big = big.unionByName(rep(base, r))
            # fixed task layout across tiers so the rows-linearity
            # ratio measures WORK, not partition-count luck
            return big.repartition(16, "vec_id").localCheckpoint(eager=True)

        n_base = base.count()
        t1, t4, t16 = tier(1), tier(4), tier(16)
        # deterministic codebooks: the smallest-vec_id vectors (the
        # bootstrap rule), drawn from the 4x tier because the base
        # corpus (2000 rows at sf0.1) is smaller than the biggest
        # codebook probed; assignment cost is what's probed here,
        # training has its own probe
        pool = [
            [float(x) for x in r["embedding"]]
            for r in t4.orderBy("vec_id").limit(4096).collect()
        ]

        def assign_sec(df, anch, kernel, n=3):
            def once():
                (
                    S._with_cell(df, "embedding", anch, kernel=kernel)
                    .agg(F.sum("cell"))
                    .collect()
                )

            once()  # warmup: bill codegen/broadcast/JIT to nobody
            best = float("inf")
            for _ in range(n):
                t0 = time.perf_counter()
                once()
                best = min(best, time.perf_counter() - t0)
            return round(best, 3)

        cal_start = calibrate(spark)
        rows = {}
        for tag, df, x in (("x1", t1, 1), ("x4", t4, 4), ("x16", t16, 16)):
            rows[f"vec_1024_{tag}"] = {
                "kernel": "vectorized", "n_anchors": 1024,
                "rows": n_base * x,
                "sec": assign_sec(df, pool[:1024], "vectorized"),
            }
            print(json.dumps({"ann_kernel": f"vec_1024_{tag}",
                              **rows[f"vec_1024_{tag}"]}))
        for tag, anch, kern in (
            ("expr_160_x1", pool[:160], "expr"),
            ("vec_160_x1", pool[:160], "vectorized"),
            ("vec_4096_x1", pool, "vectorized"),
            ("vec_4096_x4", pool, "vectorized"),
        ):
            df = t4 if tag.endswith("x4") else t1
            rows[tag] = {
                "kernel": kern, "n_anchors": len(anch),
                "rows": n_base * (4 if tag.endswith("x4") else 1),
                "sec": assign_sec(df, anch, kern),
            }
            print(json.dumps({"ann_kernel": tag, **rows[tag]}))
        # parity at probe scale: the two kernels agree on every cell
        mism = (
            S._with_cell(t1, "embedding", pool[:160], "c_e", kernel="expr")
            .join(
                S._with_cell(t1, "embedding", pool[:160], "c_v",
                             kernel="vectorized").select("vec_id", "c_v"),
                "vec_id",
            )
            .filter(F.col("c_e") != F.col("c_v"))
            .count()
        )
        sec = lambda k: rows[k]["sec"]
        payload["ann_kernel"] = {
            "base": SF_BASE, "base_rows": n_base,
            "results": rows,
            "rows_linearity_vec_1024": {
                "x4_over_x1": round(sec("vec_1024_x4") / sec("vec_1024_x1"), 2),
                "x16_over_x1": round(sec("vec_1024_x16") / sec("vec_1024_x1"), 2),
            },
            "anchor_growth_vec_x1": {
                "a4096_over_a1024": round(
                    sec("vec_4096_x1") / sec("vec_1024_x1"), 2
                ),
            },
            "expr_over_vec_160": round(sec("expr_160_x1") / sec("vec_160_x1"), 2),
            "cell_parity_mismatches_160": int(mism),
            "law": "matmul assignment is ~linear in rows and near-flat "
                   "in anchors until FLOPs dominate; the expression "
                   "kernel pays O(|anchors|) interpreted folds per row "
                   "and cannot compile at 10^4 anchors",
            "calibration": {"start": cal_start, "end": calibrate(spark)},
            "run": run_id,
        }
        probe_path.write_text(json.dumps(payload, indent=1) + "\n")
        spark.stop()
        return

    if "--hard-neg-scale" in sys.argv:
        # r13: hard-negative mining pays the within-cell CROSS-LABEL
        # pair count — pairs/row ~ N/C like the ANN screen, so the same
        # codebook law applies: frozen cells at 10x corpus pay ~10x
        # pairs/row, C ~ sqrt(N) pays ~sqrt(10).  Pair counts are EXACT
        # cell/label arithmetic (sum_c nc^2 - sum_{c,l} ncl^2, ordered
        # pairs); wall-clock runs the real miner through the
        # broadcast-matmul kernels (kernel="vectorized" on every arm so
        # arms differ only in codebook size — the 45M-pair frozen arm
        # is exactly the configuration the interpreted fold could not
        # survive, which is the point of the kernel).
        from tubes_spark.operators import similarity as S

        run_id = time.strftime("%Y-%m-%dT%H:%M:%S")
        payload = json.loads(probe_path.read_text()) if probe_path.exists() else {}
        OK = 10_000_000_000

        base = load_table(spark, "embeddings", SF_BASE).select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
            "label",
        )

        def rep(d, r):
            return d.withColumn(
                "vec_id", F.col("vec_id") + F.lit(r * OK)
            ).withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, i: F.when(
                        i == F.lit(r % 64), x + F.lit(0.001 * (r + 1))
                    ).otherwise(x),
                ),
            )

        big = rep(base, 0)
        for r in range(1, 10):
            big = big.unionByName(rep(base, r))
        big = big.localCheckpoint(eager=True)

        def stats(corpus, n_anchors, tag):
            t0 = time.perf_counter()
            anch = S.kmeans_anchors_decimal(
                corpus, n_anchors=n_anchors, iters=1, kernel="auto"
            )
            train_s = round(time.perf_counter() - t0, 3)
            per = (
                S._with_cell(corpus, "embedding", anch, kernel="vectorized")
                .groupBy("cell", "label").count()
            )
            agg = per.groupBy("cell").agg(
                F.sum("count").alias("nc"),
                F.sum(F.col("count") * F.col("count")).alias("sq"),
            )
            pairs = agg.select(
                F.sum(F.col("nc") * F.col("nc") - F.col("sq")).alias("p")
            ).collect()[0]["p"] or 0
            n = corpus.count()
            t0 = time.perf_counter()
            force(S.mine_hard_negatives(corpus, anch, kernel="vectorized"))
            mine_s = round(time.perf_counter() - t0, 3)
            row = {
                "n_anchors": n_anchors, "rows": int(n),
                "cross_label_pairs": int(pairs),
                "pairs_per_row": round(pairs / n, 1),
                "train_sec": train_s, "mine_sec": mine_s,
            }
            print(json.dumps({"hard_neg_scale": tag, **row}))
            return row

        cal_start = calibrate(spark)
        rows = {
            "base_8": stats(base, 8, "base_8"),
            "x10_frozen_8": stats(big, 8, "x10_frozen_8"),
            "x10_sqrt_25": stats(big, 25, "x10_sqrt_25"),
            "x10_linear_80": stats(big, 80, "x10_linear_80"),
        }
        ppr = lambda k: rows[k]["pairs_per_row"]
        payload["hard_neg_scale"] = {
            "base": SF_BASE, "corpus_x": 10,
            "results": rows,
            "pairs_per_row_growth": {
                "frozen_8": round(ppr("x10_frozen_8") / ppr("base_8"), 2),
                "sqrt_25": round(ppr("x10_sqrt_25") / ppr("base_8"), 2),
                "linear_80": round(ppr("x10_linear_80") / ppr("base_8"), 2),
            },
            "law": "cross-label pairs/row ~ N/C: the miner rides the "
                   "same codebook sizing rule as the ANN screen; the "
                   "matmul kernels keep per-pair cost at BLAS rates "
                   "(gate SFs stay on the bit-exact fold path)",
            "calibration": {"start": cal_start, "end": calibrate(spark)},
            "run": run_id,
        }
        probe_path.write_text(json.dumps(payload, indent=1) + "\n")
        spark.stop()
        return

    if "--ann-topk-scale" in sys.argv:
        # r13 serving path: index_topk scans candidates = sum of the
        # probed cells' inverted-list sizes, so per-query cost obeys
        # TWO dials — linear in n_probe at a fixed index (recall dial),
        # and ~N/C per probe under corpus growth (the codebook law the
        # screen/miner already measure: frozen C at 10x corpus pays
        # ~10x candidates/query, C ~ sqrt(N) pays ~sqrt(10)).
        # Candidate counts are EXACT (probe assignments joined to cell
        # sizes — no serve run needed); wall-clock runs the real
        # operator end-to-end (persisted index on disk, bucketed read,
        # matmul kernels) as corroboration.  A fixed 1%-of-base query
        # set is reused verbatim on every arm so arms differ only in
        # index/codebook/probe configuration.
        import shutil
        import tempfile

        from tubes_spark.operators import similarity as S

        run_id = time.strftime("%Y-%m-%dT%H:%M:%S")
        payload = json.loads(probe_path.read_text()) if probe_path.exists() else {}
        OK = 10_000_000_000

        base = load_table(spark, "embeddings", SF_BASE).select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        )

        def rep(d, r):
            return d.withColumn("vec_id", F.col("vec_id") + F.lit(r * OK)).withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, i: F.when(
                        i == F.lit(r % 64), x + F.lit(0.001 * (r + 1))
                    ).otherwise(x),
                ),
            )

        big = rep(base, 0)
        for r in range(1, 10):
            big = big.unionByName(rep(base, r))
        big = big.localCheckpoint(eager=True)
        queries = base.filter(F.col("vec_id") % 7 == 0).withColumn(
            "vec_id", F.col("vec_id") + F.lit(999 * OK)
        ).localCheckpoint(eager=True)
        n_q = queries.count()

        def serve_stats(corpus, n_anchors, n_probe, tag):
            t0 = time.perf_counter()
            anch = S.kmeans_anchors_decimal(
                corpus, n_anchors=n_anchors, iters=1, kernel="auto"
            )
            train_s = round(time.perf_counter() - t0, 3)
            tmp = tempfile.mkdtemp(prefix="tubes_topk_probe_")
            try:
                t0 = time.perf_counter()
                S.write_ann_index(
                    corpus, tmp, anchors=anch, kernel="vectorized"
                )
                build_s = round(time.perf_counter() - t0, 3)
                sizes = (
                    S._with_cell(corpus, "embedding", anch, kernel="vectorized")
                    .groupBy("cell").count()
                )
                cand = (
                    S._assign_cells_vectorized(
                        queries, "embedding", anch,
                        out_col="cell", n_probe=n_probe, probes_col="__p__",
                    )
                    .select(F.explode("__p__").alias("cell"))
                    .join(sizes, "cell")
                    .agg(F.sum("count").alias("c"))
                    .collect()[0]["c"]
                    or 0
                )
                t0 = time.perf_counter()
                force(S.index_topk(
                    queries, spark, tmp, k=10, n_probe=n_probe,
                    kernel="vectorized",
                ))
                serve_s = round(time.perf_counter() - t0, 3)
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
            row = {
                "n_anchors": n_anchors, "n_probe": n_probe,
                "index_rows": corpus.count(), "queries": int(n_q),
                "candidates": int(cand),
                "cand_per_query": round(cand / n_q, 1),
                "train_sec": train_s, "build_sec": build_s,
                "serve_sec": serve_s,
                "serve_ms_per_query": round(1000 * serve_s / n_q, 3),
            }
            print(json.dumps({"ann_topk_scale": tag, **row}))
            return row

        cal_start = calibrate(spark)
        rows = {
            "base_8_p1": serve_stats(base, 8, 1, "base_8_p1"),
            "base_8_p2": serve_stats(base, 8, 2, "base_8_p2"),
            "base_8_p4": serve_stats(base, 8, 4, "base_8_p4"),
            "x10_frozen_8_p2": serve_stats(big, 8, 2, "x10_frozen_8_p2"),
            "x10_sqrt_25_p2": serve_stats(big, 25, 2, "x10_sqrt_25_p2"),
            "x10_linear_80_p2": serve_stats(big, 80, 2, "x10_linear_80_p2"),
        }
        cpq = lambda t: rows[t]["cand_per_query"]
        payload["ann_topk_scale"] = {
            "base": SF_BASE, "corpus_x": 10,
            "results": rows,
            "nprobe_growth_at_fixed_index": {
                "p2_over_p1": round(cpq("base_8_p2") / cpq("base_8_p1"), 2),
                "p4_over_p1": round(cpq("base_8_p4") / cpq("base_8_p1"), 2),
            },
            "cand_per_query_growth_at_p2": {
                "frozen_8": round(cpq("x10_frozen_8_p2") / cpq("base_8_p2"), 2),
                "sqrt_25": round(cpq("x10_sqrt_25_p2") / cpq("base_8_p2"), 2),
                "linear_80": round(cpq("x10_linear_80_p2") / cpq("base_8_p2"), 2),
            },
            "law": "candidates/query = sum of probed inverted-list "
                   "sizes: linear in n_probe at a fixed index, ~N/C "
                   "per probe under growth — the serving path rides "
                   "the same sqrt(N) codebook rule as the screen and "
                   "miner, with n_probe the recall dial priced by "
                   "ann_nprobe_boundary_recall",
            "calibration": {"start": cal_start, "end": calibrate(spark)},
            "run": run_id,
        }
        probe_path.write_text(json.dumps(payload, indent=1) + "\n")
        spark.stop()
        return

    if "--ppjoin-mixed" in sys.argv:
        # VERDICT-r10 #5: the x100 jaccard synth is all-true-near-dups,
        # where PPJoin's length/positional filters structurally cannot
        # prune (r10 recorded 0.003% there, honestly).  This probe is
        # the corpus they exist for: a MIXED corpus — the sf0.1
        # documents x10 with replica-salted texts (mutually dissimilar)
        # plus a controlled ~7% fraction of true near-dups — with the
        # candidate count recorded at each pruning stage.  The stage
        # pipeline mirrors queries.py::jaccard_exact_prefix_join
        # (same prefix bound, same integer length filter, same
        # min-over-witnesses positional bound); counts are the metric,
        # so no oracle — correctness of the shared shapes is gated by
        # the query itself.
        from pyspark.storagelevel import StorageLevel

        from tubes_spark.operators import text as _text

        run_id = time.strftime("%Y-%m-%dT%H:%M:%S")
        payload = json.loads(probe_path.read_text()) if probe_path.exists() else {}
        OK = 10_000_000_000
        base = load_table(spark, "documents", SF_BASE).select("doc_id", "text")

        # mutually DISSIMILAR replicas: a replica-specific marker token
        # interleaved every 7th position breaks ~4/7 of the 5-gram
        # windows per replica pair (J ~ 0.27 << 0.8) — a suffix-salted
        # replica would share ~all shingles and be a near-dup, which is
        # exactly the degenerate corpus this probe replaces
        def rep(r):
            toks = F.split(F.col("text"), " ")
            salted = F.array_join(
                F.flatten(
                    F.transform(
                        toks,
                        lambda t, i: F.when(
                            i % 7 == 0, F.array(F.lit(f"mx{r}q"), t)
                        ).otherwise(F.array(t)),
                    )
                ),
                " ",
            )
            return base.select(
                (F.col("doc_id") + F.lit(r * OK)).alias("doc_id"),
                salted.alias("text"),
            )

        uniq = rep(0)
        for r in range(1, 10):
            uniq = uniq.unionByName(rep(r))
        # FRAGMENT docs — the pairs the filters exist for: a fragment
        # shares its source's rare shingles (guaranteed prefix
        # collision) but J = |frag|/|doc| < 0.8, so it must die in the
        # LENGTH filter, and two 60%-window fragments of one doc share
        # only the middle fifth (positional-filter fodder)
        toks = F.split(F.col("text"), " ")
        half = F.floor(F.size(toks) / 2).cast("int")
        w60 = F.floor(F.size(toks) * 6 / 10).cast("int")
        frag_head = uniq.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + F.lit(600 * OK)).alias("doc_id"),
            F.array_join(F.slice(toks, 1, half), " ").alias("text"),
        )
        frag_a = uniq.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + F.lit(700 * OK)).alias("doc_id"),
            F.array_join(F.slice(toks, 1, w60), " ").alias("text"),
        )
        frag_b = uniq.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + F.lit(800 * OK)).alias("doc_id"),
            F.array_join(
                F.slice(toks, F.size(toks) - w60 + 1, w60), " "
            ).alias("text"),
        )
        dups = (
            uniq.filter(F.col("doc_id") % 14 == 0)  # ~7% true near-dups
            .withColumn("doc_id", F.col("doc_id") + F.lit(500 * OK))
            .withColumn("text", F.concat(F.col("text"), F.lit(" neardup")))
        )
        # rank-skew families — the pairs only the POSITIONAL filter can
        # kill: A and B share a rare 5-token quote plus most of a long
        # filler (J just under 0.8, lengths matched -> length filter
        # passes; the quote is rare -> prefix collision guaranteed), but
        # B opens with ~13% unique gibberish that pushes the quote's
        # prefix RANK ~n/8 deeper in B than in A, so the min-over-
        # witnesses overlap bound refutes the pair (tests/test_round11
        # pins the same construction deterministically)
        sample = base.filter(F.col("doc_id") % 50 == 0).select("doc_id")

        def gen(tag, lo, hi):
            return F.array_join(
                F.transform(
                    F.sequence(F.lit(lo), F.lit(hi)),
                    lambda j: F.concat(
                        F.lit(tag),
                        F.col("doc_id").cast("string"),
                        F.lit("x"),
                        j.cast("string"),
                    ),
                ),
                " ",
            )

        quote, gib = gen("pq", 1, 5), gen("gb", 0, 39)
        fill300, fill260 = gen("fl", 0, 299), gen("fl", 0, 259)

        def fam(off, text_expr):
            # text FIRST (withColumn sees the input doc_id), THEN the id
            # remap — aliasing both in one select lets the new doc_id
            # shadow the input inside the token generator, silently
            # making every family's tokens disjoint
            return sample.withColumn("text", text_expr).select(
                (F.col("doc_id") + F.lit(off * OK)).alias("doc_id"), "text"
            )

        sk_a = fam(900, F.concat_ws(" ", quote, fill300))
        sk_b = fam(910, F.concat_ws(" ", gib, quote, fill260))
        sk_fill = fam(920, fill300).unionByName(fam(930, fill300)).unionByName(
            fam(940, fill300)
        )
        mixed = (
            uniq.unionByName(dups)
            .unionByName(frag_head)
            .unionByName(frag_a)
            .unionByName(frag_b)
            .unionByName(sk_a)
            .unionByName(sk_b)
            .unionByName(sk_fill)
            .localCheckpoint(eager=True)
        )
        n_docs = mixed.count()
        dup_frac = round(dups.count() / n_docs, 4)

        toks = _text.tokenize(F.col("text"))
        s = (
            mixed.select(
                "doc_id",
                F.explode(_text.word_shingles_from_tokens(toks, 5)).alias("sh"),
            )
            .distinct()
            .localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
        )
        freq = s.groupBy("sh").agg(F.count(F.lit(1)).alias("fr"))
        sz = s.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        from pyspark.sql import Window as _W

        w = _W.partitionBy("doc_id").orderBy("fr", "sh")
        ranked = (
            s.join(freq.hint("merge"), "sh")
            .withColumn("__r__", F.row_number().over(w))
            .join(sz.hint("merge"), "doc_id")
        )
        prefix_len = (F.col("n") - F.floor(F.lit(0.8) * F.col("n")) + 1).cast("int")
        pre = (
            ranked.filter(F.col("__r__") <= prefix_len)
            .select("doc_id", "sh", "__r__", "n")
            .localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
        )
        joined = (
            pre.alias("a")
            .join(pre.alias("b").hint("merge"), "sh")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        )
        raw = joined.select(
            F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db")
        ).distinct().count()
        len_ok = joined.filter(
            (4 * F.col("a.n") <= 5 * F.col("b.n"))
            & (4 * F.col("b.n") <= 5 * F.col("a.n"))
        )
        after_len = len_ok.select(
            F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db")
        ).distinct().count()
        ub = (
            F.least(F.col("a.__r__"), F.col("b.__r__"))
            + F.least(
                F.col("a.n") - F.col("a.__r__"), F.col("b.n") - F.col("b.__r__")
            )
        ).cast("long")
        alpha = F.ceil((F.col("a.n") + F.col("b.n")) * 4 / 9).cast("long")
        after_pos = (
            len_ok.select(
                F.col("a.doc_id").alias("da"),
                F.col("b.doc_id").alias("db"),
                ub.alias("__ub__"),
                alpha.alias("__alpha__"),
            )
            .groupBy("da", "db", "__alpha__")
            .agg(F.min("__ub__").alias("__mu__"))
            .filter(F.col("__mu__") >= F.col("__alpha__"))
            .count()
        )
        payload["ppjoin_mixed"] = {
            "base": SF_BASE,
            "n_docs": n_docs,
            "dup_fraction": dup_frac,
            "pairs_prefix_raw": raw,
            "pairs_after_length": after_len,
            "pairs_after_positional": after_pos,
            "prune_pct_length": round(100 * (1 - after_len / raw), 2) if raw else None,
            "prune_pct_total": round(100 * (1 - after_pos / raw), 2) if raw else None,
            "note": "mixed corpus (x10 salted uniques + 7% appended-token "
            "near-dups): the filters' candidate cut where candidate "
            "volume is NOT irreducible; the all-dup x100 synth row "
            "stays as the honest worst case",
            "run": run_id,
        }
        print(json.dumps({"ppjoin_mixed": payload["ppjoin_mixed"]}))
        probe_path.write_text(json.dumps(payload, indent=1) + "\n")
        spark.stop()
        return

    if "--x100" in sys.argv:
        # VERDICT-r6 #7: the brief's bar is "survives 100x" — replicate
        # the cheap linear families at 100x the sf0.1 base (~sf10,
        # tens of GB, multi-file layout) and record the time ratios.
        payload = json.loads(probe_path.read_text()) if probe_path.exists() else {}
        x100_dir = os.environ.get("SCALE_PROBE_X100_DIR", "/tmp/tubes_scale_x100")
        t0 = time.time()
        build_synth(spark, x100_dir, replicas=100)
        print(f"# x100 synth build: {time.time()-t0:.1f}s", file=sys.stderr)
        for t in TABLES:
            load_table(spark, t, x100_dir).count()
        X100_QUERIES = [
            "flagship_pricing_summary",
            "dedup_exact_docs",
            "gopher_quality_flags",
            "tombstone_delete_propagation",
            "bucketed_dedup_enrich_join",
            "shuffle_shards_manifest",
            "contiguous_global_ids",
            "binned_interval_counts",
            "tumbling_hourly",
            "multimodal_jpeg_ahash",
        ]
        x100 = {}
        for name in X100_QUERIES:
            fn = getattr(Q, name)
            small = best_of(fn, spark, SF_BASE)
            t0 = time.perf_counter()
            fn(spark, x100_dir).count()   # one run: the 100x cost IS the signal
            big = round(time.perf_counter() - t0, 3)
            x100[name] = {
                "sf0_1_sec": small,
                "x100_sec": big,
                "time_ratio": round(big / small, 2) if small > 0 else None,
            }
            print(json.dumps({"query": name, "replicas": 100, **x100[name]}))
        payload["x100"] = {"replicas": 100, "base": SF_BASE, "results": x100}
        probe_path.write_text(json.dumps(payload, indent=1) + "\n")
        spark.stop()
        shutil.rmtree(x100_dir, ignore_errors=True)
        return

    if "--drain-x100" in sys.argv:
        # streaming drain at 100x event volume (10M events): the last
        # extrapolated throughput claim becomes a measurement.  Same
        # harness shape as the x10 entry; bigger AvailableNow batches
        # amortize per-trigger commit overhead further, state stays one
        # (window, type) agg row per hour-bucket regardless of volume.
        run_id = time.strftime("%Y-%m-%dT%H:%M:%S")
        payload = json.loads(probe_path.read_text()) if probe_path.exists() else {}
        xe_dir = os.environ.get("SCALE_PROBE_X100E_DIR", "/tmp/tubes_scale_x100e")
        t0 = time.time()
        build_synth(spark, xe_dir, replicas=100, only={"events"})
        print(f"# x100 events build: {time.time()-t0:.1f}s", file=sys.stderr)
        from tubes_spark.streaming.run import file_replay_source
        import tempfile

        def drain_rate(sf_dir, tag, files_per_trigger):
            tmp = tempfile.mkdtemp(prefix=f"tubes_drainx100_{tag}_")
            try:
                events = load_table(spark, "events", sf_dir)
                n = events.count()
                events.repartition(32).write.parquet(f"{tmp}/in")
                prev = spark.conf.get("spark.sql.shuffle.partitions")
                spark.conf.set("spark.sql.shuffle.partitions", "8")
                try:
                    def one(ck):
                        stream = file_replay_source(
                            spark, f"{tmp}/in", events.schema,
                            max_files_per_trigger=files_per_trigger)
                        agg = (stream.withWatermark("ts", "40 days")
                               .groupBy(F.window("ts", "1 hour").alias("win"),
                                        "event_type")
                               .agg(F.count(F.lit(1)).alias("n"),
                                    F.sum("value").alias("s")))
                        t0 = time.perf_counter()
                        q = (agg.writeStream.format("noop")
                             .outputMode("update")
                             .option("checkpointLocation", f"{tmp}/{ck}")
                             .trigger(availableNow=True).start())
                        q.awaitTermination(2400)
                        return time.perf_counter() - t0

                    one("warm")
                    wall = min(one("a"), one("b"))
                    return {"events": n, "drain_sec": round(wall, 3),
                            "events_per_sec": round(n / wall)}
                finally:
                    spark.conf.set("spark.sql.shuffle.partitions", prev)
            finally:
                shutil.rmtree(tmp, ignore_errors=True)

        base_rate = drain_rate(SF_BASE, "b", 8)
        big_rate = drain_rate(xe_dir, "x100", 8)
        payload["streaming_drain_x100"] = {
            "sf0_1": base_rate,
            "x100": big_rate,
            "throughput_ratio": round(
                big_rate["events_per_sec"] / base_rate["events_per_sec"], 2),
            "note": ("100x event volume (10M events) through the same "
                     "windowed-agg drain, 4 triggers of 32 files; keyed "
                     "state is one row per (hour-window, type) — volume-"
                     "independent"),
            "run": run_id,
        }
        print(json.dumps({"streaming_drain_x100": payload["streaming_drain_x100"]}))
        probe_path.write_text(json.dumps(payload, indent=1) + "\n")
        spark.stop()
        shutil.rmtree(xe_dir, ignore_errors=True)
        return

    if "--x100-only" in sys.argv:
        # incremental 100x probe of named corpus-side families (new
        # heavy entries land without rebuilding the full heavy suite).
        names = sys.argv[sys.argv.index("--x100-only") + 1].split(",")
        run_id = time.strftime("%Y-%m-%dT%H:%M:%S")
        payload = json.loads(probe_path.read_text()) if probe_path.exists() else {}
        x100 = payload.setdefault("x100", {"replicas": 100, "base": SF_BASE,
                                           "results": {}})
        hx_dir = os.environ.get("SCALE_PROBE_X100H_DIR", "/tmp/tubes_scale_x100h")
        t0 = time.time()
        x100_tables = {"documents", "embeddings"}
        if {"record_linkage_entities", "k_anonymity_generalize",
            "l_diversity_audit"} & set(names):
            x100_tables |= {"customer", "orders"}
        build_synth(spark, hx_dir, replicas=100, only=x100_tables)
        print(f"# x100 synth build: {time.time()-t0:.1f}s", file=sys.stderr)
        cal_start = calibrate(spark)
        for name in names:
            # FRESH session per family (r9): the 8g heap carries real
            # debt between back-to-back 100x families (shuffle/codegen/
            # broadcast refs) — the r9 rerun OOM'd jaccard AFTER two
            # minhash families in one session, while the same query
            # alone survives.  Per-family isolation measures the
            # family, not its predecessors' garbage.
            spark.stop()
            spark = get_spark("tubes_scale_x100h", shuffle_partitions=64)
            spark.sparkContext.setLogLevel("ERROR")
            for t in sorted(x100_tables):
                load_table(spark, t, hx_dir).count()
            fn = getattr(Q, name)
            small = best_of(fn, spark, SF_BASE)
            t0 = time.perf_counter()
            fn(spark, hx_dir).count()   # one run: the 100x cost IS the signal
            big = round(time.perf_counter() - t0, 3)
            x100["results"][name] = {
                "sf0_1_sec": small,
                "x100_sec": big,
                "time_ratio": round(big / small, 2) if small > 0 else None,
                "note": HEAVY_NOTES.get(name, ""),
                "run": run_id,
                "calibration_start": cal_start,
                "driver_mem": os.environ.get("TUBES_SPARK_DRIVER_MEM", "8g"),
            }
            print(json.dumps({"query": name, "replicas": 100,
                              **x100["results"][name]}))
            probe_path.write_text(json.dumps(payload, indent=1) + "\n")
        x100["calibration"] = {"start": cal_start, "end": calibrate(spark),
                               "run": run_id}
        probe_path.write_text(json.dumps(payload, indent=1) + "\n")
        spark.stop()
        shutil.rmtree(hx_dir, ignore_errors=True)
        return

    if "--x100-heavy" in sys.argv:
        # VERDICT-r7 #1: the heavy north-star families (banded MinHash
        # dedup under 100x near-dup pressure, the Jaccard prefix join's
        # candidate growth, IVF ANN over a 100x corpus) previously had
        # only 10x rows; measure them at 100x, plus streaming drain
        # throughput at 10x event volume.  Only the tables each family
        # reads are replicated (documents/embeddings at 100x; events at
        # 10x), so the build cost tracks the question being asked.
        run_id = time.strftime("%Y-%m-%dT%H:%M:%S")
        payload = json.loads(probe_path.read_text()) if probe_path.exists() else {}
        x100 = payload.setdefault("x100", {"replicas": 100, "base": SF_BASE,
                                           "results": {}})
        hx_dir = os.environ.get("SCALE_PROBE_X100H_DIR", "/tmp/tubes_scale_x100h")
        t0 = time.time()
        build_synth(spark, hx_dir, replicas=100,
                    only={"documents", "embeddings"})
        print(f"# x100-heavy synth build: {time.time()-t0:.1f}s", file=sys.stderr)
        for t in ("documents", "embeddings"):
            load_table(spark, t, hx_dir).count()
        cal_start = calibrate(spark)
        for name, note in HEAVY_NOTES.items():
            # fresh session per family — see the --x100-only note
            spark.stop()
            spark = get_spark("tubes_scale_x100h", shuffle_partitions=64)
            spark.sparkContext.setLogLevel("ERROR")
            for t in ("documents", "embeddings"):
                load_table(spark, t, hx_dir).count()
            fn = getattr(Q, name)
            small = best_of(fn, spark, SF_BASE)
            t0 = time.perf_counter()
            fn(spark, hx_dir).count()   # one run: the 100x cost IS the signal
            big = round(time.perf_counter() - t0, 3)
            x100["results"][name] = {
                "sf0_1_sec": small,
                "x100_sec": big,
                "time_ratio": round(big / small, 2) if small > 0 else None,
                "note": note,
                "run": run_id,
                "calibration_start": cal_start,
                "driver_mem": os.environ.get("TUBES_SPARK_DRIVER_MEM", "8g"),
            }
            print(json.dumps({"query": name, "replicas": 100,
                              **x100["results"][name]}))
            probe_path.write_text(json.dumps(payload, indent=1) + "\n")
        x100["calibration"] = {"start": cal_start, "end": calibrate(spark),
                               "run": run_id}
        probe_path.write_text(json.dumps(payload, indent=1) + "\n")
        shutil.rmtree(hx_dir, ignore_errors=True)

        # streaming drain at 10x event volume, sized state partitions —
        # same harness shape as bench.py's _stream_drain_rate
        x10e_dir = os.environ.get("SCALE_PROBE_X10E_DIR", "/tmp/tubes_scale_x10e")
        build_synth(spark, x10e_dir, replicas=10, only={"events"})
        from tubes_spark.streaming.run import file_replay_source

        def drain_rate(sf_dir, tag):
            import tempfile

            tmp = tempfile.mkdtemp(prefix=f"tubes_drainx_{tag}_")
            try:
                events = load_table(spark, "events", sf_dir)
                n = events.count()
                events.repartition(8).write.parquet(f"{tmp}/in")
                prev = spark.conf.get("spark.sql.shuffle.partitions")
                spark.conf.set("spark.sql.shuffle.partitions", "4")
                try:
                    def one(ck):
                        stream = file_replay_source(
                            spark, f"{tmp}/in", events.schema,
                            max_files_per_trigger=8)
                        agg = (stream.withWatermark("ts", "40 days")
                               .groupBy(F.window("ts", "1 hour").alias("win"),
                                        "event_type")
                               .agg(F.count(F.lit(1)).alias("n"),
                                    F.sum("value").alias("s")))
                        t0 = time.perf_counter()
                        q = (agg.writeStream.format("noop")
                             .outputMode("update")
                             .option("checkpointLocation", f"{tmp}/{ck}")
                             .trigger(availableNow=True).start())
                        q.awaitTermination(1200)
                        return time.perf_counter() - t0

                    one("warm")
                    wall = min(one("a"), one("b"))
                    return {"events": n, "drain_sec": round(wall, 3),
                            "events_per_sec": round(n / wall)}
                finally:
                    spark.conf.set("spark.sql.shuffle.partitions", prev)
            finally:
                shutil.rmtree(tmp, ignore_errors=True)

        base_rate = drain_rate(SF_BASE, "b")
        big_rate = drain_rate(x10e_dir, "x10")
        payload["streaming_drain_x10"] = {
            "sf0_1": base_rate,
            "x10": big_rate,
            "throughput_ratio": round(
                big_rate["events_per_sec"] / base_rate["events_per_sec"], 2),
            "note": ("10x event volume through the same windowed-agg drain; "
                     "per-trigger commit overhead amortizes over bigger "
                     "batches, so ev/s should hold or improve"),
            "run": run_id,
        }
        print(json.dumps({"streaming_drain_x10": payload["streaming_drain_x10"]}))
        probe_path.write_text(json.dumps(payload, indent=1) + "\n")
        spark.stop()
        shutil.rmtree(x10e_dir, ignore_errors=True)
        return

    if "--skew-only" in sys.argv:
        # refresh just the skewed-join entry, merging into the file
        payload = json.loads(probe_path.read_text()) if probe_path.exists() else {}
        payload["skew_join"] = skew_probe(spark)
        print(json.dumps({"skew_join": payload["skew_join"]}))
        probe_path.write_text(json.dumps(payload, indent=1) + "\n")
        spark.stop()
        return

    t0 = time.time()
    build_synth(spark, out_dir)
    print(f"# synth build: {time.time()-t0:.1f}s", file=sys.stderr)
    for t in TABLES:
        load_table(spark, t, out_dir).count()  # warm listing

    run_id = time.strftime("%Y-%m-%dT%H:%M:%S")

    def probe_group(spark, names, results):
        for name in names:
            fn = getattr(Q, name)
            if name in GRAPH_PROBE:
                s_cold, s_marg = cold_and_marginal(fn, spark, SF_BASE)
                b_cold, b_marg = cold_and_marginal(fn, spark, out_dir)
                results[name] = {
                    "sf0_1": {"cold": s_cold, "marginal": s_marg},
                    "x10": {"cold": b_cold, "marginal": b_marg},
                    "time_ratio_cold": round(b_cold / s_cold, 2) if s_cold > 0 else None,
                    "time_ratio_marginal": round(b_marg / s_marg, 2) if s_marg > 0 else None,
                    "expected": "linear(<=10x)" if name in LINEAR_QUERIES
                    else "superlinear-by-construction",
                    "run": run_id,
                }
                print(json.dumps({"query": name, **results[name]}))
                merged = json.loads(probe_path.read_text()) if probe_path.exists() else {}
                merged.setdefault("results", {}).update(results)
                merged.update({"replicas": REPLICAS, "base": SF_BASE})
                probe_path.write_text(json.dumps(merged, indent=1) + "\n")
                continue
            small = best_of(fn, spark, SF_BASE)
            big = best_of(fn, spark, out_dir)
            ratio = round(big / small, 2) if small > 0 else None
            results[name] = {
                "sf0_1_sec": small,
                "x10_sec": big,
                "time_ratio": ratio,
                "expected": "linear(<=10x)" if name in LINEAR_QUERIES else "superlinear-by-construction",
                # run stamp: the incremental merge below keeps entries
                # from a crashed prior run — a removed/renamed query
                # would otherwise read as current coverage forever
                "run": run_id,
            }
            print(json.dumps({"query": name, **results[name]}))
            # write INCREMENTALLY: a later-query OOM must not lose the
            # measurements already taken (the r7 run died at query 27
            # of 30 with everything only in the log)
            merged = json.loads(probe_path.read_text()) if probe_path.exists() else {}
            merged.setdefault("results", {}).update(results)
            merged.update({"replicas": REPLICAS, "base": SF_BASE})
            probe_path.write_text(json.dumps(merged, indent=1) + "\n")

    results: dict = {}
    probe_group(spark, LINEAR_QUERIES, results)
    # fresh session for the superlinear graph group: the 10x trigram
    # sim build on top of 26 queries' accumulated localCheckpoint
    # blocks has OOM'd a shared heap
    spark.stop()
    spark = get_spark("tubes_scale_probe_super", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLES:
        load_table(spark, t, out_dir).count()
    probe_group(spark, SUPERLINEAR_QUERIES, results)

    # merge into the existing file: the x100 entry (its own --x100 run)
    # must survive a 10x refresh
    # full-run completion REPLACES the results map wholesale (only the
    # incremental mid-run writes merge) — stale keys cannot survive a
    # completed refresh
    payload = json.loads(probe_path.read_text()) if probe_path.exists() else {}
    payload.update({
        "replicas": REPLICAS,
        "base": SF_BASE,
        "last_full_run": run_id,
        "results": results,
        "note": ("graph-family sf0.1 times reflect the session-cached sim "
                 "graph (best-of-2 hits the materialized edge list); "
                 "marginal cost by design"),
    })
    # persist the query results BEFORE the skew phase: the skew build is
    # the one stage that has OOM'd under the memory the query loop's
    # session-cached graphs pin (a 10x-synth rare-shingle edge list plus
    # a 32M-row checkpoint is too much for one heap) — results must
    # survive a skew-phase death, and skew gets a FRESH session below
    probe_path.write_text(json.dumps(payload, indent=1) + "\n")
    spark.stop()
    spark = get_spark("tubes_skew_probe", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    payload["skew_join"] = skew_probe(spark)
    print(json.dumps({"skew_join": payload["skew_join"]}))
    probe_path.write_text(json.dumps(payload, indent=1) + "\n")
    spark.stop()
    shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
