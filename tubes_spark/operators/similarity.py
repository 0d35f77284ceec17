"""Similarity search over embedding columns (north-star extension).

Baseline: brute-force cosine top-k — a broadcast of the (small) query
set against the (huge) corpus, dot products via ``F.zip_with`` +
``F.aggregate`` (JVM lambda expressions, no Python), then a per-query
top-k window.  Scale path: LSH bucketing (random hyperplane signs) so
only same-bucket pairs are compared — the corpus shuffles once on a
small integer bucket key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float/double> columns — zip_with +
    aggregate, fully JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries is broadcast (it is the small side by construction); the
    corpus is scanned once with no shuffle; per-query top-k via a
    window over the query id — shuffle rows = |corpus|×|queries| scored
    pairs only if materialized; rank pushes down to partial top-k with
    AQE.  Excludes self-matches."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv__")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv__"))
    scored = c.crossJoin(F.broadcast(q)).filter(F.col("neighbor_id") != F.col("query_id"))
    scored = scored.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("__qv__"), F.col("__cv__")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hyperplane_bucket(vec: Column, dim: int, n_planes: int = 8, seed: int = 7) -> Column:
    """Sign-LSH bucket id: sign pattern of dot products with n_planes
    pseudo-random hyperplanes.  Planes are derived deterministically from
    (seed, plane, coordinate) via a hash -> [-1,1) weights, so both the
    Spark side and any oracle can reproduce them."""
    bucket = F.lit(0)
    for p in range(n_planes):
        # deterministic pseudo-weights: hash(p, i) scaled to [-1, 1)
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda v, i: v.cast("double")
                * ((F.pmod(F.xxhash64(F.lit(seed + p), i), F.lit(2000003)) / F.lit(1000001.5)) - F.lit(1.0)),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: only compare query/corpus pairs sharing an LSH
    bucket.  One narrow shuffle on the integer bucket key; candidate set
    shrinks ~2^n_planes-fold vs brute force."""
    b = lambda df, idn, vn: df.select(
        F.col(id_col).alias(idn), F.col(vec_col).alias(vn),
        hyperplane_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    c = b(corpus, "neighbor_id", "__cv__")
    q = b(queries, "query_id", "__qv__")
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("__qv__"), F.col("__cv__")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_dedup(
    df: DataFrame,
    threshold: float = 0.98,
    dim: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
) -> DataFrame:
    """Embedding-cosine near-dup removal: bucket by sign-LSH, compare
    within buckets, drop the higher id of any pair above threshold."""
    if not dim:
        raise ValueError("pass the embedding dimensionality")
    b = df.select(
        F.col(id_col), F.col(vec_col),
        hyperplane_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    a2 = b.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket")
    b2 = b.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket")
    dups = (
        a2.join(b2, on="bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cosine(F.col("va"), F.col("vb")) >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return df.join(dups, on=id_col, how="left_anti")
