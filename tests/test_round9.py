"""Round 9: ADVICE-r8 fixes (compaction publish, funnel empty-doc
parity, fingerprint canonical escaping, size_buckets fallback) and the
incremental input fingerprint (VERDICT r8 next-round #5)."""

import json
import os
from pathlib import Path

import pandas as pd
import pytest

from tests.conftest import SF_SMALL


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
