"""Deduplication operators for LLM-data pipelines (north-star).

Four tiers, all shuffle-frugal:

* exact       — groupBy(hash of canonical text): one shuffle.
* minhash+LSH — shingle -> k minhashes -> b bands; identical band
                signature -> candidate pair: shuffles on tiny band keys
                only, never all-pairs.  (Broder 1997 resemblance / LSH
                banding as in MMDS ch.3.)
* simhash     — 64-bit hypercube signature; duplicates = equal simhash
                (or small hamming radius via rotations).
* n-gram Jaccard — exact verify step on LSH candidates.

Everything below is built-in Column expressions (xxhash64, transform,
aggregate); no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tubes_spark.operators.text import normalize, word_shingles


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id document per canonical text.  One shuffle on
    the 64-bit content hash (not the full text — narrow shuffle rows)."""
    h = F.xxhash64(normalize(F.col(text_col)))
    w = Window.partitionBy("__h__").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__h__", h)
        .withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__h__", "__rn__")
    )


def minhash_signature(shingles: Column, k: int = 64, seed: int = 1337) -> Column:
    """k minhash values of a shingle set: min over xxhash64(shingle, seed_i).
    array<long>, computed with JVM transform/array_min — no UDF."""
    return F.array(
        *[F.array_min(F.transform(shingles, lambda s, i=i: F.xxhash64(s, F.lit(seed + i)))) for i in range(k)]
    )


def lsh_bands(sig: Column, bands: int, rows: int) -> Column:
    """Split a k=bands*rows signature into band hashes -> array<struct<band,int h:long>>."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(F.concat_ws(",", *[F.element_at(sig, b * rows + r + 1).cast("string") for r in range(rows)])).alias("h"),
            )
            for b in range(bands)
        ]
    )


def minhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash LSH banding.

    Plan shape (scale-critical): explode to (band, band_hash, id) — rows
    = docs * bands, tiny — then a self-equi-join on (band, band_hash).
    The join key is a 64-bit hash, so the shuffle is narrow and uniform;
    no all-pairs comparison ever happens.
    Returns (id_a, id_b) with id_a < id_b, distinct."""
    rows = num_hashes // bands
    sh = df.select(
        F.col(id_col), word_shingles(F.col(text_col), shingle_k).alias("sh")
    ).withColumn("sig", minhash_signature(F.col("sh"), num_hashes))
    banded = sh.select(
        F.col(id_col), F.explode(lsh_bands(F.col("sig"), bands, rows)).alias("b")
    ).select(F.col(id_col), F.col("b.band").alias("band"), F.col("b.h").alias("h"))
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, on=["band", "h"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    return pairs


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> DataFrame:
    """Exact shingle-Jaccard for candidate pairs (verify step after LSH).
    Joins the (small) candidate set back to shingle arrays; similarity =
    |A∩B| / |A∪B| via array_intersect/array_union — JVM-side."""
    sh = df.select(F.col(id_col), F.array_distinct(word_shingles(F.col(text_col), shingle_k)).alias("sh"))
    out = (
        pairs.join(sh.withColumnsRenamed({id_col: "id_a", "sh": "sh_a"}), on="id_a")
        .join(sh.withColumnsRenamed({id_col: "id_b", "sh": "sh_b"}), on="id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
    )
    return out


def dedup_minhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-dedup: drop any doc that has a higher-similarity twin with a
    smaller id (greedy keep-first, the standard large-corpus policy)."""
    cand = minhash_candidates(df, text_col, id_col, shingle_k=shingle_k)
    dup_ids = (
        jaccard_pairs(df, cand, text_col, id_col, shingle_k=shingle_k)
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return df.join(dup_ids, on=id_col, how="left_anti")


def simhash(text_col: Column, bits: int = 64, shingle_k: int = 2) -> Column:
    """SimHash signature: sign-sum of per-shingle hash bits.

    Column-only formulation: for each bit b, count shingles whose hash
    has bit b set vs unset; bit b of the result = majority.  Expressed
    as aggregate over the shingle array — one pass, no UDF."""
    sh = word_shingles(text_col, shingle_k)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    def bit_vote(b: int) -> Column:
        ones = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(F.lit(1 << b) if b < 63 else F.lit(-(1 << 63))) != 0, 1).otherwise(0),
        )
        return (ones * 2 > F.size(hashes)).cast("int")
    # pack 64 bit votes into one long
    out = F.lit(0).cast("long")
    for b in range(bits):
        vote = bit_vote(b).cast("long")
        out = out + F.shiftleft(vote, b)
    return out


def dedup_simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16) -> DataFrame:
    """Exact-signature SimHash dedup (hamming radius 0): group by the
    signature, keep lowest id.  For radius>0 at scale, band the signature
    into 4 chunks and LSH-join like minhash (pigeonhole)."""
    w = Window.partitionBy("__sh__").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__sh__", simhash(F.col(text_col), bits=bits))
        .withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__sh__", "__rn__")
    )
