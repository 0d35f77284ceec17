"""Physical-plan assertions: the scale properties the engine promises
(predicate pushdown, column pruning, broadcast joins, map-side partial
aggregation) must be visible in explain output — not assumed."""

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import functions as F

import tubes_spark.queries as Q
from tubes_spark.plans import n_nodes, plan_of

SF = "/root/testdata/sf0.001"


def test_filter_pushdown_reaches_scan(spark):
    p = plan_of(Q.filter_pushdown(spark, SF))
    assert "PushedFilters" in p
    assert re.search(r"PushedFilters: \[.*GreaterThanOrEqual\(l_quantity", p), p


def test_column_pruning(spark):
    """map_net_price touches 4 columns; the scan must not read all 11."""
    p = plan_of(Q.map_net_price(spark, SF))
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m, p
    cols = [c.split(":")[0] for c in m.group(1).split(",")]
    assert set(cols) == {"l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"}


def test_broadcast_join_for_dimension(spark):
    p = plan_of(Q.join_broadcast_parts(spark, SF))
    assert "BroadcastHashJoin" in p


def test_q5_broadcasts_all_dims(spark):
    p = plan_of(Q.q5_nation_revenue(spark, SF))
    assert p.count("BroadcastHashJoin") >= 3, p


def test_partial_aggregation_before_shuffle(spark):
    """Grouped fold must show partial (map-side) + final hash aggregate."""
    p = plan_of(Q.flagship_pricing_summary(spark, SF))
    assert n_nodes(p, "HashAggregate") >= 2, p
    assert "Exchange" in p


def test_whole_stage_codegen_on_hot_path(spark):
    """AQE only reveals codegen spans in the final plan — execute first."""
    df = Q.flagship_pricing_summary(spark, SF)
    df.collect()
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("codegen")
    p = buf.getvalue()
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", p)
    assert m and int(m.group(1)) >= 1, p[:2000]


def test_take_uses_limit_not_full_sort(spark):
    """take(n) should plan TakeOrderedAndProject, not a global Sort."""
    p = plan_of(Q.take_ordered(spark, SF))
    assert "TakeOrderedAndProject" in p, p


def test_running_fold_single_shuffle(spark):
    """Per-key running sum: exactly one Exchange (hashpartitioning on
    user_id) — no extra shuffles."""
    p = plan_of(Q.running_user_sum(spark, SF))
    assert n_nodes(p, "Exchange") == 1, p


def test_asof_single_shuffle(spark):
    """The union/window as-of join shuffles once on the by-key."""
    p = plan_of(Q.asof_purchase(spark, SF))
    # one Exchange for the window partitionBy; union sides read pre-shuffle
    assert n_nodes(p, "Exchange") == 1, p


def test_q20_single_lineitem_scan(spark):
    """The correlated part-level threshold derives from the per-(part,
    supplier) partials via a window — lineitem must be scanned once,
    not once per aggregation level."""
    p = plan_of(Q.q20_heavy_part_shippers(spark, SF))
    scans = re.findall(r"\(\d+\) Scan parquet", p)
    # lineitem + supplier + nation = exactly 3 scans
    assert len(scans) == 3, p


def test_q21_no_expand_for_distinct_pair(spark):
    """Two countDistincts in one agg would plan an Expand (2x shuffle
    volume); the two-level aggregate form must not contain one."""
    p = plan_of(Q.q21_sole_return_supplier(spark, SF))
    assert n_nodes(p, "Expand") == 0, p
    assert p.count("BroadcastHashJoin") >= 2, p


def test_q2_window_not_self_join(spark):
    """The correlated-MIN subquery is a row_number window per part: one
    Exchange for the window, dims broadcast, no SortMergeJoin."""
    p = plan_of(Q.q2_min_cost_supplier(spark, SF))
    assert n_nodes(p, "SortMergeJoin") == 0, p
    assert "BroadcastHashJoin" in p
    assert n_nodes(p, "Window") >= 1, p


def test_split_train_test_is_projection_only(spark):
    """The hash split must stay a per-row projection: no Exchange at all."""
    p = plan_of(Q.split_train_test_hash(spark, SF))
    assert n_nodes(p, "Exchange") == 0, p


def test_embedding_centroids_partial_agg(spark):
    """posexplode + grouped mean must partial-aggregate before its one
    shuffle on (label, pos)."""
    p = plan_of(Q.embedding_centroids(spark, SF))
    assert n_nodes(p, "HashAggregate") >= 2, p
    assert n_nodes(p, "Exchange") == 1, p


def test_simhash_radius_no_cartesian(spark):
    """Radius-2 simhash dedup must stay a banded equi-join — never an
    all-pairs product."""
    from tubes_spark.catalog import load_table
    from tubes_spark.operators import dedup

    d = load_table(spark, "documents", SF)
    p = plan_of(dedup.dedup_simhash(d, radius=2))
    assert n_nodes(p, "CartesianProduct") == 0, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_tfidf_builds_without_driver_action(spark):
    """The corpus-size scalar must enter the plan as a broadcast one-row
    agg — constructing the query runs NO Spark job (the r2 d.count()
    regression, VERDICT #5)."""
    st = spark.sparkContext.statusTracker()

    def jobs_during(fn):
        before = set(st.getJobIdsForGroup(None))
        fn(spark, SF)
        return len(set(st.getJobIdsForGroup(None)) - before)

    jobs_during(Q.text_tfidf_top_terms)   # warm both paths' file listings
    jobs_during(Q.text_token_counts)
    # token_counts is plan-only by construction; its job count during
    # building (parquet schema reads) is the floor — tfidf must match
    # it, i.e. add NO extra job (the r2 d.count() ran one per call)
    floor = jobs_during(Q.text_token_counts)
    assert jobs_during(Q.text_tfidf_top_terms) <= floor, (
        "tfidf construction ran more jobs than a plan-only query"
    )
    df = Q.text_tfidf_top_terms(spark, SF)
    assert "BroadcastNestedLoopJoin" in plan_of(df)  # the one-row agg rides broadcast


def test_decontaminate_broadcasts_benchmark(spark):
    """The benchmark shingle set (eval-suite sized) must be the
    broadcast side; the corpus shingle stream stays map-side up to the
    join, and the distinct count happens without an Expand."""
    p = plan_of(Q.decontaminate_ngram(spark, SF))
    assert "BroadcastHashJoin" in p, p
    assert "Expand" not in p, p


def test_pack_sequences_window_is_partitioned(spark):
    """Packing must parallelize per shard: a hash-partitioned window,
    never an Exchange SinglePartition funnel."""
    p = plan_of(Q.pack_sequences_bins(spark, SF))
    assert "Window" in p, p
    assert "Exchange SinglePartition" not in p, p


def test_docs_length_band_partial_percentile_broadcast(spark):
    """The percentile band is a one-row agg (partial map-side) broadcast
    back onto the scan — the corpus itself never shuffles."""
    p = plan_of(Q.docs_length_band(spark, SF))
    assert "BroadcastNestedLoopJoin" in p, p
    assert "partial_percentile" in p, p
    assert "Exchange hashpartitioning" not in p, p


def test_partitioned_read_prunes_partitions(spark):
    """A lang-partitioned layout + lang filter must prune at the
    DIRECTORY level: the filter appears under PartitionFilters (not
    PushedFilters), so non-matching partitions are never even listed."""
    import shutil
    import tempfile

    from tubes_spark import sources
    from tubes_spark.catalog import load_table

    d = load_table(spark, "documents", SF)
    tmp = tempfile.mkdtemp(prefix="tubes_part_plan_")
    try:
        sources.write_parquet(d, f"{tmp}/docs", partition_by=["lang"])
        back = sources.read_parquet(spark, f"{tmp}/docs")
        p = plan_of(back.filter(F.col("lang").isin("en", "de")).select("doc_id"))
        assert "PartitionFilters" in p and "lang" in p.split("PartitionFilters", 1)[1][:200], p
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_dsir_models_broadcast(spark):
    """The 256-row target/raw bucket models must ride broadcast joins;
    only the bucket-count aggs and the final per-doc agg may shuffle."""
    p = plan_of(Q.dsir_importance_weights(spark, SF))
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p, p


def test_incremental_dedup_joins_on_digest(spark):
    """The anti-join must probe on the md5 digest (never raw text) and
    the arriving side's scan must prune text out of the join payload."""
    p = plan_of(Q.dedup_incremental_new_docs(spark, SF))
    assert "LeftAnti" in p, p
    assert "md5" in p.lower(), p


def test_weighted_sample_no_extra_shuffle(spark):
    """A-ES sampling is projection + one keyed window: exactly one
    Exchange (hashpartitioning on source)."""
    p = plan_of(Q.sample_weighted_per_source(spark, SF))
    assert len(re.findall(r"\(\d+\) Exchange\b", p)) == 1, p
    assert "hashpartitioning(source" in p, p


def test_cdc_scd2_single_keyed_window(spark):
    p = plan_of(Q.cdc_scd2_intervals(spark, SF))
    assert len(re.findall(r"\(\d+\) Exchange\b", p)) == 1, p
    assert "hashpartitioning(user_id" in p, p
    assert "Join" not in p, p


def test_events_scan_pushes_ts_filter(spark):
    """With the r4 loader the ts column is TIMESTAMP at the scan, so a
    ts predicate must reach PushedFilters (the r3 NTZ+cast path ate it)."""
    from tubes_spark.catalog import load_table

    e = load_table(spark, "events", SF).filter(
        F.col("ts") >= "2024-06-01"
    ).select("event_id", "ts")
    p = plan_of(e)
    assert re.search(r"PushedFilters: \[.*ts", p), p


def test_source_kl_broadcasts_models(spark):
    """The global token model and the per-source totals are broadcast;
    the only wide shuffles are the two count aggs + the final agg."""
    p = plan_of(Q.source_kl_divergence(spark, SF))
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p, p


def test_observed_metrics_free_telemetry(spark):
    """Observation metrics must report from the SAME pass as the action
    — no extra jobs — and match independently-computed values."""
    from tubes_spark.catalog import load_table
    from tubes_spark.plans import observed

    d = load_table(spark, "orders", SF)
    df, obs = observed(
        d, "quality",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(27,6)")).cast("double").alias("total"),
        F.count(F.when(F.col("o_orderstatus").isNull(), 1)).alias("null_status"),
    )
    n = df.count()
    got = obs.get
    assert got["n_rows"] == n
    expect_total = d.agg(
        F.sum(F.col("o_totalprice").cast("decimal(27,6)")).cast("double")
    ).first()[0]
    assert got["total"] == expect_total
    assert got["null_status"] == d.filter(F.col("o_orderstatus").isNull()).count()


def test_join_strategy_hints_control_plan(spark):
    """The engine exposes Spark's join-strategy control surface: hints
    must actually change the physical join operator."""
    from tubes_spark.catalog import load_table

    li = load_table(spark, "lineitem", SF)
    orders = load_table(spark, "orders", SF)
    p_merge = plan_of(
        li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
    )
    assert "SortMergeJoin" in p_merge, p_merge
    p_shj = plan_of(
        li.join(orders.hint("shuffle_hash"), li.l_orderkey == orders.o_orderkey)
    )
    assert "ShuffledHashJoin" in p_shj, p_shj


# --- round-5c plan shapes -------------------------------------------------

def test_pivot_is_single_aggregate_no_value_discovery(spark):
    """Pinned pivot values => ONE aggregate pass over orders, no extra
    distinct-scan job to discover the pivot column's values."""
    p = plan_of(Q.pivot_priority_by_year(spark, SF))
    assert n_nodes(p, "Scan parquet") == 1, p
    # Spark compiles pivot to a two-phase aggregate ((yr, pri) cells,
    # then wide rows keyed on yr) — still one scan, two bounded
    # exchanges whose payload is the tiny cell table
    assert n_nodes(p, "Exchange") <= 2, p
    assert n_nodes(p, "HashAggregate") >= 2, p  # partial + final


def test_cube_expands_without_extra_scans(spark):
    """CUBE is one Expand over one scan — never 4 scans unioned."""
    p = plan_of(Q.cube_pricing_lattice(spark, SF))
    assert n_nodes(p, "Scan parquet") == 1, p
    assert n_nodes(p, "Expand") == 1, p


def test_window_battery_single_exchange(spark):
    """All ten window functions share one partition key + sort: exactly
    one shuffle, one sort."""
    p = plan_of(Q.window_funcs_battery(spark, SF))
    assert n_nodes(p, "Exchange") == 1, p


def test_url_blocklist_broadcasts(spark):
    p = plan_of(Q.url_domain_blocklist(spark, SF))
    assert "BroadcastHashJoin" in p, p


def test_pii_redaction_is_map_only(spark):
    """Redaction is a pure projection: no Exchange anywhere."""
    p = plan_of(Q.pii_redaction_scrub(spark, SF))
    assert "Exchange" not in p, p


def test_span_scrub_boiler_set_broadcasts(spark):
    p = plan_of(Q.span_scrub_exact_substrings(spark, SF))
    assert "BroadcastHashJoin" in p, p


def test_split_assignment_no_shuffle_before_agg(spark):
    """The md5 bucket is a projection; the only exchange is the final
    3-group aggregate."""
    p = plan_of(Q.split_train_val_test(spark, SF))
    assert n_nodes(p, "Exchange") <= 1, p


def test_span_rewrite_plan_no_corpus_broadcast(spark):
    """Every corpus-scaling join in the ExactSubstr rewrite is pinned
    shuffle_hash: a stale-estimate BroadcastHashJoin over the gram/
    position/covered-position tables is the exact 100x OOM the
    jaccard prefix join hit before its pin."""
    p = plan_of(Q.dedup_span_rewrite(spark, SF))
    assert n_nodes(p, "BroadcastHashJoin") == 0
    assert n_nodes(p, "ShuffledHashJoin") >= 3  # dup-gram, scrub anti, base
    assert n_nodes(p, "CartesianProduct") == 0


def test_funnel_attribution_plan_single_wide_exchange(spark):
    """Attribution costs one narrow hash shuffle (the dedup window on
    the 64-bit content hash) beyond the scan + fan — rules are
    map-side projections, so no join or aggregate exchange appears."""
    p = plan_of(Q.curation_funnel_attribution(spark, SF))
    assert n_nodes(p, "Window") == 1
    assert n_nodes(p, "SortMergeJoin") == 0
    assert n_nodes(p, "ShuffledHashJoin") == 0
    assert n_nodes(p, "BroadcastHashJoin") == 0
    # the window's hash-partition exchange is the only one
    assert n_nodes(p, "Exchange") == 1


def test_hashed_linear_score_plan_pure_codegen(spark):
    """The hashed linear model is an expression, not a table: no join
    anywhere; one partial/final aggregate pair on doc_id (plus the
    fan exchange) is the whole plan."""
    p = plan_of(Q.quality_hashed_linear_score(spark, SF))
    assert n_nodes(p, "BroadcastHashJoin") == 0
    assert n_nodes(p, "SortMergeJoin") == 0
    assert n_nodes(p, "ShuffledHashJoin") == 0
    assert n_nodes(p, "HashAggregate") == 2  # partial + final
