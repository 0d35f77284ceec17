"""Semantic tests for the LSH-based operators whose results the SQL
oracle can't reproduce (xxhash64/numpy-seeded structures): recall vs
brute-force ground truth, candidate-set containment, idempotence."""

from pyspark.sql import functions as F

from tubes_spark.catalog import load_table
from tubes_spark.operators import dedup, similarity

SF = "/root/testdata/sf0.001"


def test_minhash_candidates_cover_high_jaccard_pairs(spark):
    """LSH banding (16 bands x 4 rows) must recall nearly all pairs with
    jaccard >= 0.8 (collision prob ~1-(1-0.8^4)^16 ~= 99.97%)."""
    d = load_table(spark, "documents", SF)
    sh = dedup.shingle_frame(d)
    truth = (
        dedup.jaccard_pairs(d, _all_pairs(spark, d), shingles=sh)
        .filter(F.col("jaccard") >= 0.8)
        .select("id_a", "id_b")
        .collect()
    )
    cand = {(r["id_a"], r["id_b"]) for r in dedup.minhash_candidates(d, shingles=sh).collect()}
    missed = [t for t in truth if (t["id_a"], t["id_b"]) not in cand]
    assert len(missed) <= max(1, len(truth) // 20), f"missed {len(missed)}/{len(truth)}"


def _all_pairs(spark, d):
    ids = d.select(F.col("doc_id").alias("id_a"))
    ids2 = d.select(F.col("doc_id").alias("id_b"))
    return ids.crossJoin(ids2).filter(F.col("id_a") < F.col("id_b"))


def test_dedup_exact_idempotent(spark):
    d = load_table(spark, "documents", SF)
    once = dedup.dedup_exact(d)
    twice = dedup.dedup_exact(once)
    assert once.count() == twice.count()


def test_dedup_exact_removes_known_dup(spark):
    """Inject a verbatim duplicate with a higher id; it must be removed
    and the original kept."""
    d = load_table(spark, "documents", SF)
    row = d.orderBy("doc_id").limit(1)
    dup = row.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    out = dedup.dedup_exact(d.unionByName(dup))
    assert out.count() == dedup.dedup_exact(d).count()
    assert out.filter(F.col("doc_id") >= 1_000_000).count() == 0


def test_dedup_minhash_removes_near_dup(spark):
    """A doc with one word changed out of many must still be caught."""
    d = load_table(spark, "documents", SF)
    src = d.orderBy(F.length("text").desc()).limit(1)
    near = src.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        "lang", "source", "n_chars",
    )
    combined = d.unionByName(near.select(d.columns))
    out = dedup.dedup_minhash(combined, threshold=0.8)
    assert out.filter(F.col("doc_id") >= 1_000_000).count() == 0


def test_knn_lsh_recall_vs_bruteforce(spark):
    emb = load_table(spark, "embeddings", SF)
    q = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_bruteforce(emb, q, k=10).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_lsh(emb, q, dim=64, k=10, n_planes=4, n_tables=8).collect()
    }
    recall = len(exact & approx) / len(exact)
    # 8-table OR-amplified sign-LSH: p_collide ~ 1-(1-(1-theta/pi)^4)^8
    assert recall >= 0.5, f"recall {recall}"


def test_knn_excludes_self(spark):
    emb = load_table(spark, "embeddings", SF)
    q = emb.filter(F.col("vec_id") < 10)
    out = similarity.knn_bruteforce(emb, q, k=10)
    assert out.filter(F.col("query_id") == F.col("neighbor_id")).count() == 0


def test_embedding_dedup_removes_exact_copy(spark):
    emb = load_table(spark, "embeddings", SF)
    copy = emb.orderBy("vec_id").limit(1).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label"
    )
    combined = emb.unionByName(copy.select(emb.columns))
    out = similarity.embedding_dedup(combined, threshold=0.999, dim=64)
    assert out.filter(F.col("vec_id") >= 1_000_000).count() == 0


def test_multimodal_feature_plumbing(spark):
    """Binary media columns flow through Arrow-batched extraction with
    the declared schema (decode itself is a deterministic fake)."""
    from tubes_spark.operators.multimodal import extract_features

    rows = [("m1", b"\x00\x01\x02"), ("m2", b"\xff\xfe"), ("m3", None)]
    df = spark.createDataFrame(rows, schema="media_id string, content binary")
    out = extract_features(df, dim=4).collect()
    assert {r["media_id"] for r in out} == {"m1", "m2", "m3"}
    for r in out:
        assert len(r["feature"]) == 4
    nb = {r["media_id"]: r["n_bytes"] for r in out}
    assert nb == {"m1": 3, "m2": 2, "m3": 0}


def test_knn_ivf_recall_vs_bruteforce(spark):
    from tubes_spark.operators import similarity as S
    emb = load_table(spark, "embeddings", SF)
    q = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.knn_bruteforce(emb, q, k=10).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in S.knn_ivf(emb, q, dim=64, k=10, n_cells=16, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    # probing 4/16 cells covers ~the nearest quadrant of the space
    assert recall >= 0.5, f"recall {recall}"


def test_simhash_candidates_match_bruteforce_hamming(spark):
    """Pigeonhole banding must find EXACTLY the pairs within the hamming
    radius (candidates are verified in-plan, so equality not just
    recall) — pinned against driver-side brute force over the real
    corpus signatures."""
    d = load_table(spark, "documents", SF)
    sh = dedup.shingle_frame(d, shingle_k=2)
    sig = sh.select(F.col("doc_id"), dedup.simhash_from_hashes(F.col("hs"), 32).alias("__sh__"))
    sigs = {r["doc_id"]: r["__sh__"] for r in sig.collect()}
    radius = 2
    ids = sorted(sigs)
    truth = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(sigs[a] ^ sigs[b]).count("1") <= radius
    }
    got = {(r["id_a"], r["id_b"]) for r in dedup.simhash_candidates(sig, radius, bits=32).collect()}
    assert got == truth, f"missed={truth - got} extra={got - truth}"
    assert len(truth) > 0, "corpus has no radius-2 simhash pairs; test is vacuous"


def test_simhash_radius_on_synthetic_signatures(spark):
    """Constructed signatures at hamming distance 0/1/2/3: radius=2 must
    pair exactly the <=2 distances."""
    base = 0b1011_0110_1011_0110_1011_0110_1011_0110
    rows = [
        (1, base),
        (2, base ^ 0b1),            # d=1 from id 1
        (3, base ^ 0b110),          # d=2 from id 1, d=3 from id 2
        (4, base ^ 0b111000111),    # d=6 from id 1: out of radius
    ]
    sig = spark.createDataFrame(rows, "doc_id long, __sh__ long")
    got = {(r["id_a"], r["id_b"]) for r in dedup.simhash_candidates(sig, 2, bits=32).collect()}
    assert got == {(1, 2), (1, 3)}


def test_dedup_simhash_radius_removes_near_twin(spark):
    """End-to-end radius-2 dedup drops a doc whose signature sits within
    hamming-2 of a smaller-id doc, and is idempotent."""
    d = load_table(spark, "documents", SF)
    out = dedup.dedup_simhash(d, bits=32, shingle_k=2, radius=2)
    again = dedup.dedup_simhash(out, bits=32, shingle_k=2, radius=2)
    n_r0 = dedup.dedup_simhash(d, bits=32, shingle_k=2, radius=0).count()
    assert out.count() <= n_r0              # radius-2 can only remove more
    assert again.count() == out.count()     # idempotent


def test_connected_components_chain_and_star(spark):
    """Chain 1-2-3, separate pair 5-6, star 10-12 / 11-12: smallest-id
    label propagation converges to the component minimum."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (10, 12), (11, 12)], "id_a long, id_b long"
    )
    comp = {r["id"]: r["comp"] for r in dedup.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 10: 10, 11: 10, 12: 10}


def test_dedup_minhash_components_policy(spark):
    """components policy keeps exactly one doc per near-dup cluster:
    two near-copies of the same base doc form one cluster with the base,
    and only the base survives.  Greedy agrees here; the CC guarantee is
    'exactly one per cluster' regardless of pair shape."""
    d = load_table(spark, "documents", SF)
    src = d.orderBy(F.length("text").desc()).limit(1)
    near1 = src.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        "lang", "source", "n_chars",
    )
    near2 = src.select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" other end")).alias("text"),
        "lang", "source", "n_chars",
    )
    combined = d.unionByName(near1.select(d.columns)).unionByName(near2.select(d.columns))
    out = dedup.dedup_minhash(combined, threshold=0.8, policy="components")
    assert out.filter(F.col("doc_id") >= 1_000_000).count() == 0
    base_id = src.collect()[0]["doc_id"]
    assert out.filter(F.col("doc_id") == base_id).count() == 1


def test_embedding_dedup_catches_boundary_straddling_pair(spark):
    """VERDICT r2 #2: a near-dup pair split by ONE hyperplane of table 0
    is invisible to single-table LSH but must be caught by the
    OR-amplified default (n_tables=4).  The pair is constructed by
    reflecting a corpus vector across the table-0 plane it projects
    least onto (cos >= 0.997, table-0 buckets differ)."""
    import numpy as np

    emb = load_table(spark, "embeddings", SF)
    pdf = emb.orderBy("vec_id").limit(200).toPandas()
    vecs = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    planes = similarity._hyperplanes(64, 6, 7, n_tables=4)  # same seed as bucket_ids

    def buckets(v):
        signs = np.einsum("d,lpd->lp", v, planes) >= 0
        return signs @ np.power(2, np.arange(6))  # per-table bucket (4,)

    pick = None
    for i in range(len(vecs)):
        v = vecs[i]
        proj = planes[0] @ v  # projections on table-0 planes (6,)
        p = np.argmin(np.abs(proj))
        u = planes[0][p] / np.linalg.norm(planes[0][p])
        v2 = v - 2 * (v @ u) * u  # reflection: flips sign on plane p only
        cos = (v @ v2) / (np.linalg.norm(v) * np.linalg.norm(v2))
        b1, b2 = buckets(v), buckets(v2)
        if cos >= 0.997 and b1[0] != b2[0] and (b1[1:] == b2[1:]).any():
            pick = (int(pdf["vec_id"].iloc[i]), v2, cos)
            break
    assert pick is not None, "no reflectable vector found (seed/data changed?)"
    vid, v2, cos = pick
    dup = spark.createDataFrame(
        [(9_000_000, [float(x) for x in v2], "dup")], "vec_id long, embedding array<float>, label string"
    )
    combined = emb.unionByName(dup.select(emb.columns))
    caught = similarity.embedding_dedup(combined, threshold=0.99, dim=64, n_tables=4)
    assert caught.filter(F.col("vec_id") == 9_000_000).count() == 0, (
        f"OR-amplified dedup missed the straddling pair (cos={cos:.5f})"
    )
    missed = similarity.embedding_dedup(combined, threshold=0.99, dim=64, n_tables=1)
    assert missed.filter(F.col("vec_id") == 9_000_000).count() == 1, (
        "single-table unexpectedly caught the pair — test no longer demonstrates the gap"
    )


def test_bucket_topk_scorer_chunked_equals_naive():
    """The chunked per-bucket top-k kernel (degenerate-bucket cap) must
    equal the naive full-matmul top-k, including (sim desc, id asc)
    tie-breaks, when the bucket is far larger than the chunk size."""
    import numpy as np

    from tubes_spark.operators import similarity as S

    rng = np.random.default_rng(3)
    n, nq, dim, k = 1000, 5, 16, 10
    cm = rng.standard_normal((n, dim))
    # 50% duplicates: the degenerate corpus the cap exists for
    cm[n // 2:] = cm[: n // 2]
    qm = rng.standard_normal((nq, dim))
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    q_by_bucket = {0: (np.arange(nq), qm)}
    import pandas as pd
    pdf = pd.DataFrame({"vec_id": np.arange(n), "embedding": list(cm)})

    old = S._SCORE_CHUNK
    S._SCORE_CHUNK = 64  # force many chunks (driver-side call, same process)
    try:
        got = S._bucket_topk_scorer(q_by_bucket, k, "vec_id", "embedding")((0,), pdf)
    finally:
        S._SCORE_CHUNK = old

    cn = cm / np.linalg.norm(cm, axis=1, keepdims=True)
    sims = np.round(cn @ qm.T, 6)
    for q in range(nq):
        order = sorted(range(n), key=lambda i: (-sims[i, q], i))[: k + 1]
        expect = {(i, sims[i, q]) for i in order}
        have = {
            (r.neighbor_id, r.cos_sim)
            for r in got[got["query_id"] == q].itertuples()
        }
        assert have == expect, f"query {q}"


def test_dedup_minhash_pre_exact_same_survivors(spark):
    """The pre_exact skew guard (collapse verbatim copies before LSH)
    must not change the survivor set — checked on a corpus where half
    the docs are exact duplicates (the degenerate case it exists for)."""
    d = load_table(spark, "documents", SF).limit(200)
    copies = d.limit(100).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    corpus = d.unionByName(copies.select(d.columns))
    base = {r["doc_id"] for r in dedup.dedup_minhash(corpus, threshold=0.8).select("doc_id").collect()}
    fast = {r["doc_id"] for r in dedup.dedup_minhash(corpus, threshold=0.8, pre_exact=True).select("doc_id").collect()}
    assert base == fast
    assert not any(i >= 1_000_000 for i in base)  # all copies gone either way


def test_knn_ivf_distributed_training_recall(spark):
    """IVF with full-corpus distributed k-means training must reach at
    least the recall of the sample-trained variant's floor."""
    emb = load_table(spark, "embeddings", SF)
    q = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_bruteforce(emb, q, k=10).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_ivf(
            emb, q, dim=64, k=10, n_cells=16, n_probe=4, train="distributed"
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"recall {recall}"


def test_kmeans_distributed_centroids_are_unit_norm(spark):
    """Distributed trainer invariants: (n_cells, dim) shape, unit-norm
    centroids (spherical k-means), deterministic under a fixed seed."""
    import numpy as np

    emb = load_table(spark, "embeddings", SF)
    c1 = similarity.kmeans_train_distributed(emb, 64, n_cells=8, iters=3)
    c2 = similarity.kmeans_train_distributed(emb, 64, n_cells=8, iters=3)
    assert c1.shape == (8, 64)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)
    assert np.allclose(c1, c2)


def test_winnow_matches_python_reference(spark):
    """Pin the JVM-side winnowing (k-gram rolling-hash fingerprints)
    against a literal pure-python implementation of the algorithm,
    using Spark's own xxhash64 for the gram hashes."""
    import re as _re

    from tubes_spark.operators import text as T

    d = load_table(spark, "documents", SF).limit(20).cache()
    k, w = 8, 4
    got = {r["doc_id"]: list(r["fps"]) for r in T.winnow(d, "text", k=k, w=w).collect()}

    # gram -> xxhash64 via Spark itself (the hash fn is the JVM's)
    texts = {r["doc_id"]: r["text"] for r in d.collect()}
    grams_per_doc = {}
    for doc_id, text in texts.items():
        norm = _re.sub(r"\s+", " ", text.lower()).strip()
        n = max(len(norm) - (k - 1), 1)
        grams_per_doc[doc_id] = [norm[i:i + k] for i in range(n)]
    all_grams = sorted({g for gs in grams_per_doc.values() for g in gs})
    hdf = spark.createDataFrame([(g,) for g in all_grams], "g string")
    hmap = {r["g"]: r["h"] for r in hdf.select("g", F.xxhash64("g").alias("h")).collect()}

    for doc_id, grams in grams_per_doc.items():
        hashes = [hmap[g] for g in grams]
        n_windows = max(len(hashes) - (w - 1), 1)
        expect = sorted({min(hashes[i:i + w]) for i in range(n_windows)})
        assert got[doc_id] == expect, f"doc {doc_id}"


def test_semantic_dedup_drops_planted_near_dups(spark):
    """SemDeDup (k-means cells + within-cell cosine pruning): planted
    near-copies of existing vectors land in the same cell as their
    original (cosine ~1 -> same argmax centroid) and must be dropped,
    keeping the lowest-id member; untouched vectors all survive."""
    emb = load_table(spark, "embeddings", SF)
    originals = emb.filter(F.col("vec_id") < 5)
    # near-copy: same vector, every component nudged by +1e-3
    near = originals.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(1e-3)).cast("array<float>").alias("embedding"),
        "label",
    )
    combined = emb.unionByName(near.select(emb.columns))
    out = similarity.semantic_dedup(combined, threshold=0.999, dim=64, n_cells=8)
    assert out.filter(F.col("vec_id") >= 1_000_000).count() == 0
    # the lowest-id originals survive, and nothing else was dropped
    assert out.filter(F.col("vec_id") < 5).count() == 5
    assert out.count() == emb.count()


def test_semantic_dedup_keeps_distinct_vectors(spark):
    """At a near-exact threshold the natural table (no duplicate
    vectors) passes through unchanged."""
    emb = load_table(spark, "embeddings", SF)
    out = similarity.semantic_dedup(emb, threshold=0.9999, dim=64, n_cells=8)
    assert out.count() == emb.count()


def test_radius_neighbors_matches_bruteforce_filter(spark):
    """Range search must return exactly the pairs a full top-k scan
    finds at or above the threshold (same scoring kernel, no window)."""
    emb = load_table(spark, "embeddings", SF)
    q = emb.filter(F.col("vec_id") < 10)
    n = emb.count()
    full = similarity.knn_bruteforce(emb, q, k=n)
    want = {
        (r["query_id"], r["neighbor_id"], r["cos_sim"])
        for r in full.filter(F.col("cos_sim") >= 0.25).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"], r["cos_sim"])
        for r in similarity.radius_neighbors(emb, q, threshold=0.25).collect()
    }
    assert got == want and len(got) > 0


def test_cross_corpus_flags_catches_reworded_bench_doc(spark):
    """A train doc that lightly rewords a benchmark doc (high but <1
    Jaccard) must be flagged; unrelated docs must not; benchmark docs
    themselves never appear in the output."""
    words = [f"w{i}" for i in range(40)]
    bench_text = " ".join(words)
    # rewording: change the last two words -> 3-shingle Jaccard ~ 36/42
    leaked = " ".join(words[:-2] + ["xx", "yy"])
    rows = [
        (0, bench_text, "bench"),
        (1, leaked, "train"),
        (2, " ".join(f"z{i}" for i in range(40)), "train"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    bench_ids = d.filter(F.col("source") == "bench").select("doc_id")
    out = dedup.cross_corpus_flags(d, bench_ids, threshold=0.5).collect()
    flagged = {r["doc_id"]: r for r in out}
    assert 1 in flagged and flagged[1]["n_matches"] == 1
    assert 0.5 <= flagged[1]["max_jaccard"] < 1.0
    assert 2 not in flagged and 0 not in flagged


def test_pq_encode_reconstructs_centroids(spark):
    """A vector that IS a concatenation of codebook centroids must
    encode exactly to those centroid ids — the quantizer's fixed point."""
    import numpy as np

    emb = load_table(spark, "embeddings", SF)
    books = similarity.pq_train(emb, dim=64, m=8, k=16)
    picks = [3, 7, 0, 15, 9, 1, 12, 5]
    vec = np.concatenate([books[j][picks[j]] for j in range(8)])
    df = spark.createDataFrame(
        [(0, [float(x) for x in vec])], "vec_id long, embedding array<float>"
    )
    code = similarity.pq_encode(df, books).collect()[0].pq_code
    assert list(code) == picks


def test_knn_pq_rerank_recall_vs_bruteforce(spark):
    emb = load_table(spark, "embeddings", SF)
    q = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_bruteforce(emb, q, k=10).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_pq_adc(
            emb, q, dim=64, k=10, m=8, n_codes=64, rerank=50
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    # 50-candidate ADC shortlist re-ranked exactly; measured sweep at
    # this sf: (m=8,k=16)->0.63, (m=8,k=64)->0.83, (m=8,k=256)->0.98 —
    # recall rises with codebook size exactly as PQ predicts
    assert recall >= 0.7, f"recall {recall}"


# ---------------------------------------------------- recall@k contracts (r5)

import pytest as _pytest


@_pytest.mark.parametrize(
    "tier,thresh,make",
    [
        # thresholds are CONTRACTS: the structures are seeded, so recall
        # is deterministic on the fixture corpus — a parameter change
        # that craters recall fails loudly here, not silently in prod.
        # measured on this corpus: lsh 0.89, ivf 0.93, pq+rerank 0.96
        ("lsh", 0.85,
         lambda emb, q: similarity.knn_lsh(emb, q, dim=64, k=10, n_planes=4, n_tables=16)),
        ("ivf", 0.90,
         lambda emb, q: similarity.knn_ivf(emb, q, dim=64, k=10, n_cells=16, n_probe=12)),
        ("pq_rerank", 0.95,
         lambda emb, q: similarity.knn_pq_adc(emb, q, dim=64, k=10, m=8, n_codes=64, rerank=100)),
    ],
    ids=["lsh@0.85", "ivf@0.90", "pq_rerank@0.95"],
)
def test_ann_tier_recall_contract(spark, tier, thresh, make):
    """Each ANN tier must clear its recall@10 floor vs brute-force
    cosine ground truth over 20 fixture queries."""
    emb = load_table(spark, "embeddings", SF)
    q = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_bruteforce(emb, q, k=10).collect()
    }
    approx = {(r["query_id"], r["neighbor_id"]) for r in make(emb, q).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= thresh, f"{tier} recall@10 {recall:.3f} < {thresh}"


def test_arith_minhash_drops_exact_and_near_dups(spark):
    """The oracle-expressible MinHash (arith family) must behave like a
    near-dedup: a verbatim copy shares every band key with its source
    (dropped), and the survivor set is deterministic and idempotent."""
    d = load_table(spark, "documents", SF)
    row = d.orderBy(F.length("text").desc()).limit(1)
    dup = row.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    out = dedup.dedup_minhash_arith(d.unionByName(dup))
    assert out.filter(F.col("doc_id") >= 1_000_000).count() == 0
    base = dedup.dedup_minhash_arith(d)
    assert base.count() == dedup.dedup_minhash_arith(base).count()
    # survivors are a function of the data alone: two runs agree exactly
    a = {r["doc_id"] for r in base.select("doc_id").collect()}
    b = {r["doc_id"] for r in dedup.dedup_minhash_arith(d).select("doc_id").collect()}
    assert a == b and 0 < len(a) <= d.count()
