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
