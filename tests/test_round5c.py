"""Semantic pins for the round-5c additions, beyond the auto-generated
DuckDB parity (test_oracle_parity): each new operator family gets one
ground-truth assertion computed a DIFFERENT way than the query."""

import pandas as pd
import pytest

from tests.conftest import SF_SMALL
from tubes_spark import queries as Q


def _docs(spark):
    return (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
    )


def test_pivot_row_totals_match_order_count(spark):
    out = Q.pivot_priority_by_year(spark, SF_SMALL).toPandas()
    total = int(
        out[["p_urgent", "p_high", "p_medium", "p_notspec", "p_low"]].sum().sum()
    )
    n_orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").count()
    assert total == n_orders


def test_cube_lattice_has_all_four_grouping_levels(spark):
    out = Q.cube_pricing_lattice(spark, SF_SMALL).toPandas()
    assert sorted(out["gid"].unique()) == [0, 1, 2, 3]
    # grand total row equals the sum of the finest cells
    fine = out[out.gid == 0]
    grand = out[out.gid == 3]
    assert len(grand) == 1
    assert int(fine["n_rows"].sum()) == int(grand["n_rows"].iloc[0])


def test_window_battery_percent_rank_bounds(spark):
    out = Q.window_funcs_battery(spark, SF_SMALL).toPandas()
    assert out["pct_rank"].between(0.0, 1.0).all()
    assert out["cume"].between(0.0, 1.0).all()
    assert set(out["quartile"].unique()) <= {1, 2, 3, 4}
    # first/last frame pins: first_price <= nothing, but within each
    # customer first_price is constant
    g = out.groupby("o_custkey")["first_price"].nunique()
    assert (g == 1).all()


def test_setops_cohorts_partition_purchasers(spark):
    out = Q.setops_buyer_cohorts(spark, SF_SMALL).toPandas()
    # cohorts are disjoint and cover every purchaser exactly once
    assert out["user_id"].is_unique
    e = spark.read.parquet(f"{SF_SMALL}/events.parquet").toPandas()
    buyers = set(e[e.event_type == "purchase"]["user_id"])
    assert set(out["user_id"]) == buyers


def test_anomaly_spikes_flag_matches_pandas(spark):
    out = Q.anomaly_daily_spikes(spark, SF_SMALL).toPandas()
    e = spark.read.parquet(f"{SF_SMALL}/events.parquet").toPandas()
    e["day"] = e["ts"].dt.floor("D")
    daily = e.groupby(["user_id", "day"])["value"].sum().reset_index()
    mean = daily.groupby("user_id")["value"].mean().rename("mean")
    m = daily.merge(mean, on="user_id")
    expected = (m["value"] > 3 * m["mean"]).sum()
    # tolerance-free count match (decimal-vs-float rounding can't flip a
    # 3x threshold on this data)
    assert int(out["spike"].sum()) == int(expected)


def test_inverted_index_postings_roundtrip_one_term(spark):
    out = Q.inverted_index_postings(spark, SF_SMALL).toPandas()
    docs = _docs(spark)
    term = "query"
    row = out[out.term == term].iloc[0]
    expected_docs = sorted(
        int(r.doc_id) for r in docs.itertuples() if term in r.text.split()
    )
    assert row["postings"] == ",".join(str(d) for d in expected_docs)
    assert int(row["df"]) == len(expected_docs)


def test_split_train_val_test_covers_all_docs(spark):
    out = Q.split_train_val_test(spark, SF_SMALL).toPandas()
    n_docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    assert int(out["n_docs"].sum()) == n_docs
    assert set(out["split"]) <= {"train", "val", "test"}
    # 80/10/10 within sampling noise on the md5 bucket
    train = int(out[out.split == "train"]["n_docs"].iloc[0])
    assert 0.6 * n_docs < train < 0.95 * n_docs


def test_retention_week0_counts_every_user(spark):
    out = Q.retention_cohorts_weekly(spark, SF_SMALL).toPandas()
    n_users = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    # every user is active in their own cohort week (offset 0)
    assert int(out[out.week_offset == 0]["n_active"].sum()) == n_users
    assert (out["week_offset"] >= 0).all()


def test_pii_redaction_removes_every_pattern(spark):
    out = Q.pii_redaction_scrub(spark, SF_SMALL).toPandas()
    assert (out["n_emails"] >= 1).all()
    assert (out["n_phones"] >= 1).all()
    assert (out["n_ips"] >= 1).all()
    assert out["redacted_head"].str.contains("<EMAIL>").all()
    assert out["redacted_head"].str.contains("<PHONE>").all()
    assert not out["redacted_head"].str.contains("@mail.example.com").any()


def test_url_blocklist_blocks_exactly_listed_domains(spark):
    out = Q.url_domain_blocklist(spark, SF_SMALL).toPandas()
    blocked = {
        f"src{i}-{j}.example.com" for i in (3, 7, 11) for j in (0, 13, 26, 39)
    }
    assert set(out[out.blocked]["domain"]) <= blocked
    assert not out[~out.blocked]["domain"].isin(blocked).any()


def test_span_scrub_accounting_and_monotonicity(spark):
    out = Q.span_scrub_exact_substrings(spark, SF_SMALL).toPandas()
    assert (out["n_kept"] + out["n_removed"] == out["n_toks"]).all()
    assert (out["n_removed"] >= 0).all()
    # some template text must exist in the synthetic corpus (df>=3
    # 5-grams are common in word-soup): the scrub must actually fire
    assert int(out["n_removed"].sum()) > 0


def test_phrase_positions_verify_against_python(spark):
    out = Q.phrase_search_positions(spark, SF_SMALL).toPandas()
    docs = _docs(spark)
    expected = set()
    for r in docs.itertuples():
        toks = r.text.split()
        for i in range(len(toks) - 2):
            if toks[i : i + 3] == ["the", "fast", "query"]:
                expected.add((int(r.doc_id), i))
    got = {(int(a), int(b)) for a, b in zip(out.doc_id, out.match_pos)}
    assert got == expected


def test_triangles_match_networkx_free_bruteforce(spark):
    out = Q.graph_triangle_rare_shingles(spark, SF_SMALL).toPandas()
    docs = _docs(spark)
    from collections import defaultdict

    by_sh = defaultdict(set)
    for r in docs.itertuples():
        toks = r.text.split()
        for i in range(len(toks) - 4):
            by_sh[" ".join(toks[i : i + 5])].add(int(r.doc_id))
    edges = {
        tuple(sorted(v)) for v in by_sh.values() if len(v) == 2
    }
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    counts = defaultdict(int)
    for u, v in edges:
        for w in adj[u] & adj[v]:
            counts[u] += 1
            counts[v] += 1
            counts[w] += 1
    # each triangle counted once per corner: brute force adds 1 per
    # corner per triangle containing it (u,v edge loop counts each
    # triangle 3x total, once per edge) -> divide by... each triangle
    # {a,b,c} has 3 edges; the loop over edges visits it 3 times and
    # increments all three corners each time? No: for edge (u,v) only
    # common neighbors w complete THIS edge's triangle; the triangle is
    # seen once per edge = 3 times, each time incrementing its 3 nodes.
    expected = {k: v // 3 for k, v in counts.items() if v}
    got = {int(r.doc_id): int(r.n_triangles) for r in out.itertuples()}
    assert got == expected


def test_repetition_signals_match_python(spark):
    out = Q.repetition_signals(spark, SF_SMALL).toPandas()
    docs = _docs(spark)
    from collections import Counter

    r0 = docs.iloc[0]
    toks = r0.text.split()
    bi = Counter(" ".join(toks[i : i + 2]) for i in range(len(toks) - 1))
    tri = Counter(" ".join(toks[i : i + 3]) for i in range(len(toks) - 2))
    row = out[out.doc_id == r0.doc_id].iloc[0]
    assert int(row["top_bigram_count"]) == max(bi.values())
    assert int(row["n_bi"]) == sum(bi.values())
    assert int(row["dup_tri"]) == sum(c for c in tri.values() if c >= 2)


def test_minhash_estimate_error_in_sqrt_k_regime(spark):
    """16 hashes -> std ~ sqrt(J(1-J)/16) <= 0.125; the mean |err| over
    candidate pairs must sit well inside a few sigma."""
    out = Q.minhash_estimate_error(spark, SF_SMALL).toPandas()
    assert len(out) > 0
    assert (out["abs_err"] >= 0).all()
    assert out["abs_err"].mean() < 0.25
    # estimates are multiples of 1/16
    assert ((out["est_jaccard"] * 16).round(6) % 1 == 0).all()


def test_asof_next_event_against_pandas(spark):
    out = Q.asof_next_event(spark, SF_SMALL).toPandas()
    e = spark.read.parquet(f"{SF_SMALL}/events.parquet").toPandas()
    e = e.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    import numpy as np

    got = {int(r.purchase_id): r.micros_to_next_view for r in out.itertuples()}
    checked = 0
    for uid, g in e.groupby("user_id"):
        rows = list(g.itertuples())
        for i, r in enumerate(rows):
            if r.event_type != "purchase":
                continue
            nxt = next(
                (x.ts for x in rows[i + 1 :] if x.event_type == "view"), None
            )
            expect = None
            if nxt is not None:
                micros = (nxt - r.ts).value // 1000
                if micros <= 3_600_000_000:
                    expect = micros
            gv = got[int(r.event_id)]
            if expect is None:
                assert gv is None or np.isnan(gv)
            else:
                assert int(gv) == expect
            checked += 1
    assert checked == len(out)


def test_bfs_hops_match_python_bfs(spark):
    out = Q.graph_bfs_hops(spark, SF_SMALL).toPandas()
    docs = _docs(spark)
    from collections import defaultdict, deque

    by_sh = defaultdict(set)
    for r in docs.itertuples():
        toks = r.text.split()
        for i in range(len(toks) - 4):
            by_sh[" ".join(toks[i : i + 5])].add(int(r.doc_id))
    adj = defaultdict(set)
    for v in by_sh.values():
        if len(v) == 2:
            a, b = sorted(v)
            adj[a].add(b)
            adj[b].add(a)
    seeds = [int(r.doc_id) for r in docs.itertuples() if r.doc_id % 100 == 0]
    dist = {s: 0 for s in seeds}
    dq = deque(seeds)
    while dq:
        u = dq.popleft()
        if dist[u] >= 3:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    got = {int(r.doc_id): int(r.dist) for r in out.itertuples()}
    assert got == dist


def test_bm25_matches_pure_python(spark):
    import math
    from collections import Counter

    out = Q.bm25_search_scores(spark, SF_SMALL).toPandas()
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").toPandas()
    terms = ["table", "merge", "window"]
    k1, b = 1.2, 0.75
    toks = {int(r.doc_id): r.text.split() for r in docs.itertuples()}
    N = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / N
    df = {t: sum(1 for ts in toks.values() if t in ts) for t in terms}
    expected = {}
    for did, ts in toks.items():
        c = Counter(ts)
        score = 0.0
        hits = 0
        for t in terms:
            if c[t] == 0:
                continue
            hits += 1
            idf = math.log((N - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            score += round(
                idf * (c[t] * (k1 + 1)) / (c[t] + k1 * (1 - b + b * len(ts) / avgdl)),
                6,
            )
        if hits:
            expected[did] = (hits, round(score, 6))
    got = {
        int(r.doc_id): (int(r.n_terms_hit), round(float(r.bm25), 6))
        for r in out.itertuples()
    }
    assert got == expected


def test_markov_transitions_probabilities_sum_to_one(spark):
    out = Q.markov_event_transitions(spark, SF_SMALL).toPandas()
    sums = out.groupby("from_type")["p"].sum()
    assert ((sums - 1.0).abs() < 1e-4).all()
    # counts conserve: total transitions = total events - n_users
    e = spark.read.parquet(f"{SF_SMALL}/events.parquet").toPandas()
    assert int(out["n"].sum()) == len(e) - e["user_id"].nunique()


def test_cluster_stats_conserve_docs(spark):
    comp = Q.connected_components_jaccard(spark, SF_SMALL).toPandas()
    stats = Q.near_dup_cluster_stats(spark, SF_SMALL).toPandas()
    assert int((stats["cluster_size"] * stats["n_clusters"]).sum()) == len(comp)
    assert (stats["cluster_size"] >= 2).all()


def test_corr_regression_matches_numpy(spark):
    import numpy as np

    out = Q.stats_corr_regression(spark, SF_SMALL).toPandas()
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").toPandas()
    for r in out.itertuples():
        g = li[(li.l_returnflag == r.l_returnflag) & (li.l_linestatus == r.l_linestatus)]
        x, y = g["l_discount"].values, g["l_quantity"].values
        assert abs(r.pearson_r - np.corrcoef(x, y)[0, 1]) < 1e-4
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(r.ols_slope - slope) < 1e-3
        assert abs(r.ols_intercept - intercept) < 1e-3


def test_schema_evolution_union_conserves_orders(spark):
    out = Q.schema_evolution_union(spark, SF_SMALL).toPandas()
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet").toPandas()
    assert int(out["n_orders"].sum()) == len(o)
    # the legacy half lands in UNKNOWN
    unknown = int(out[out.o_orderpriority == "UNKNOWN"]["n_orders"].iloc[0])
    assert unknown == int((o["o_orderkey"] % 2 == 0).sum())


def test_langid_confusion_exposes_metadata_only_labels(spark):
    """The synthetic corpus is English-vocab word soup under every
    declared lang: the matrix must show the detector never confirming
    a non-en label (the audit finding), and rows must normalize."""
    out = Q.langid_confusion_matrix(spark, SF_SMALL).toPandas()
    assert set(out["lang_pred"]) <= {"en", "und"}
    non_en = out[(out.lang != "en") & out.is_correct]
    assert len(non_en) == 0
    sums = out.groupby("lang")["frac_of_declared"].sum()
    assert ((sums - 1.0).abs() < 1e-4).all()


def test_winsorize_bounds_and_clip_semantics(spark):
    out = Q.winsorize_event_values(spark, SF_SMALL).toPandas()
    assert (out["clipped"] >= out["lo"] - 1e-9).all()
    assert (out["clipped"] <= out["hi"] + 1e-9).all()
    inside = out[~out.was_clipped]
    assert (inside["clipped"] == inside["value"]).all()
    # ~2% of each type clips (P01/P99 tails), never more than ~6%
    frac = out.groupby("event_type")["was_clipped"].mean()
    assert (frac < 0.06).all() and (frac > 0).all()


def test_debounce_matches_pandas_lag(spark):
    out = Q.debounce_user_events(spark, SF_SMALL).toPandas()
    e = spark.read.parquet(f"{SF_SMALL}/events.parquet").toPandas()
    e = e.sort_values(["user_id", "event_type", "ts", "event_id"])
    prev = e.groupby(["user_id", "event_type"])["ts"].shift(1)
    gap_ok = ((e["ts"] - prev).dt.total_seconds() >= 300) | prev.isna()
    expected = dict(zip(e["event_id"].astype(int), gap_ok))
    got = dict(zip(out["event_id"].astype(int), out["kept"]))
    assert got == expected


def test_embedding_outlier_cosine_matches_numpy(spark):
    import numpy as np

    out = Q.embedding_outlier_screen(spark, SF_SMALL).toPandas()
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").toPandas()
    vecs = {int(r.vec_id): np.array(r.embedding, dtype=np.float64) for r in emb.itertuples()}
    labels = {int(r.vec_id): int(r.label) for r in emb.itertuples()}
    cents = {}
    for lbl in set(labels.values()):
        m = np.stack([v for k, v in vecs.items() if labels[k] == lbl])
        cents[lbl] = m.mean(axis=0)
    for r in out.itertuples():
        v, c = vecs[int(r.vec_id)], cents[int(r.label)]
        cos = float(v @ c / (np.linalg.norm(v) * np.linalg.norm(c)))
        assert abs(r.cos_to_centroid - cos) < 1e-3
    assert len(out) == len(emb)


def test_nfc_normalization_composes_and_changes_length(spark):
    out = Q.unicode_nfc_normalize(spark, SF_SMALL).toPandas()
    # every doc carries exactly one decomposed grapheme -> len shrinks by 1
    assert (out["len_raw"] - out["len_nfc"] == 1).all()
    assert out["changed"].all()
    import unicodedata

    docs = _docs(spark)
    r0 = docs.iloc[0]
    expected = unicodedata.normalize("NFC", "café " + r0.text)
    import hashlib

    row = out[out.doc_id == r0.doc_id].iloc[0]
    assert row["nfc_md5"] == hashlib.md5(expected.encode()).hexdigest()
