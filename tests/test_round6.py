"""Round-6 additions: real PNG pixel codec (zlib inflate + unfilter),
cross-codec hash parity, and the supporting operators.

Reference scope note: the reference (Tubes.hs) has no media handling;
these are the north-star training-data-pipeline extensions (multimodal
columns as opaque binary + real pure-stdlib decoders where codecs
aren't needed)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tubes_spark.operators.multimodal import (
    bmp_ahash_hex,
    decode_png,
    encode_png,
    parse_media_header,
    png_ahash_hex,
)

# --------------------------------------------------------------------------
# PNG codec: encode/decode roundtrip must be the identity on pixels
# --------------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(8, 1), (8, 16), (5, 3), (1, 1), (13, 9), (32, 7)])
@pytest.mark.parametrize("filters", [None, [0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_roundtrip_identity(shape, filters):
    rng = np.random.RandomState(shape[0] * 100 + shape[1])
    arr = rng.randint(0, 256, (*shape, 3)).astype(np.uint8)
    out = decode_png(encode_png(arr, filters=filters))
    assert out.dtype == np.uint8 and out.shape == arr.shape
    assert (out == arr).all()


def test_png_decoder_rejects_malformed():
    for bad in (b"", b"notapng", b"\x89PNG\r\n\x1a\x00rest"):
        with pytest.raises(ValueError):
            decode_png(bad)
    # interlaced / non-RGB forms must be rejected loudly, not mis-decoded
    ok = bytearray(encode_png(np.zeros((2, 2, 3), np.uint8)))
    ihdr_color_byte = 8 + 8 + 9  # sig + len/tag + (w,h,depth)
    ok[ihdr_color_byte] = 6  # claim RGBA
    with pytest.raises(ValueError):
        decode_png(bytes(ok))


def test_png_header_sniffer_agrees_with_encoder():
    arr = np.zeros((4, 7, 3), np.uint8)
    mime, w, h, _ = parse_media_header(encode_png(arr))
    assert (mime, w, h) == ("image/png", 7, 4)


def test_png_multi_idat_decodes():
    """Spec allows IDAT split across chunks; decoder must concatenate."""
    import struct
    import zlib

    arr = np.arange(8 * 3 * 3, dtype=np.uint8).reshape(8, 3, 3) % 256
    full = encode_png(arr)
    # rebuild: split the single IDAT body into two chunks
    sig, rest = full[:8], full[8:]
    chunks = []
    pos = 0
    while pos < len(rest):
        ln = int.from_bytes(rest[pos:pos + 4], "big")
        tag = rest[pos + 4:pos + 8]
        body = rest[pos + 8:pos + 8 + ln]
        chunks.append((tag, body))
        pos += 12 + ln

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    out = bytearray(sig)
    for tag, body in chunks:
        if tag == b"IDAT":
            mid = len(body) // 2
            out += chunk(b"IDAT", body[:mid]) + chunk(b"IDAT", body[mid:])
        else:
            out += chunk(tag, body)
    assert (decode_png(bytes(out)) == arr).all()


def test_ahash_identical_across_codecs():
    """The same pixels through the BMP path and the PNG path must hash
    identically — the hash is a pixel property, not a codec property."""
    rng = np.random.RandomState(42)
    arr = rng.randint(0, 256, (8, 12, 3)).astype(np.uint8)
    png_hash = png_ahash_hex(encode_png(arr, filters=[4, 3, 2, 1, 0]))

    # hand-build the equivalent 24bpp bottom-up BMP (stored BGR)
    h, w = arr.shape[:2]
    stride = (3 * w + 3) // 4 * 4
    rows = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        row = bytearray()
        for c in range(w):
            rr, g, b = (int(x) for x in arr[r, c])
            row += bytes([b, g, rr])
        row += b"\x00" * (stride - 3 * w)
        rows += row
    header = (
        b"BM" + (54 + len(rows)).to_bytes(4, "little") + b"\x00" * 4
        + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(rows).to_bytes(4, "little")
        + b"\x00" * 16
    )
    bmp_hash = bmp_ahash_hex(bytes(header) + bytes(rows))
    assert png_hash == bmp_hash


# --------------------------------------------------------------------------
# the oracle-gated query runs and produces stable per-row hashes
# --------------------------------------------------------------------------


def test_bucketed_enrich_join_docs_side_exchange_free(spark, tmp_path):
    """The scale claim of bucketed_dedup_enrich_join, plan-asserted:
    with broadcast disabled (the 100 TB shape), the repeated
    candidates-x-corpus join must read the bucketed docs side with NO
    Exchange — versus the plain-parquet plan, which shuffles the corpus
    for every replay."""
    from tubes_spark import sources
    from tubes_spark.catalog import load_table

    d = load_table(spark, "documents", "/root/testdata/sf0.001")
    slim = d.select(
        "doc_id",
        "n_chars",
        F.floor(F.col("n_chars") / 10).alias("len_band"),
        F.conv(F.substring(F.md5(F.col("text")), 1, 1), 16, 10)
        .cast("int")
        .alias("band"),
    )
    tbl = "t_r6_bkt_plan"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        sources.write_bucketed(
            slim, tbl, ["doc_id"], 8, path=str(tmp_path / "docs"),
            sort_cols=["doc_id"],
        )
        bt = sources.read_table(spark, tbl)
        cand = (
            bt.select(F.col("doc_id").alias("doc_a"), "len_band", "band")
            .join(bt.select(F.col("doc_id").alias("doc_b"), "len_band", "band"),
                  ["len_band", "band"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
        )

        def enrich(docs):
            return (
                cand.join(docs.select("doc_id", F.col("n_chars").alias("len_a")),
                          F.col("doc_a") == F.col("doc_id")).drop("doc_id")
                .join(docs.select("doc_id", F.col("n_chars").alias("len_b")),
                      F.col("doc_b") == F.col("doc_id")).drop("doc_id")
            )

        plan_bucketed = enrich(bt)._jdf.queryExecution().executedPlan().toString()
        plan_plain = enrich(slim)._jdf.queryExecution().executedPlan().toString()
        # the two enrichment probes shuffle in the plain plan but not in
        # the bucketed one; the candidate blocking join shuffles in both
        assert plan_bucketed.count("Exchange") <= plan_plain.count("Exchange") - 2
        assert "SortMergeJoin" in plan_bucketed
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


# --------------------------------------------------------------------------
# write-side Python DataSource: manifest two-phase commit
# --------------------------------------------------------------------------


def test_manifest_jsonl_writer_roundtrip(spark, tmp_path):
    """The write-side connector publishes exactly the rows written, the
    manifest is consistent (counts + md5 per file), and nothing outside
    the manifest is visible."""
    import hashlib
    import json

    from tubes_spark import datasource

    datasource.register(spark)
    df = spark.range(100).selectExpr("id AS k", "id * 3 AS v").repartition(7)
    out = str(tmp_path / "sink")
    df.write.format("manifest_jsonl").option("path", out).mode("append").save()

    manifest = json.loads((tmp_path / "sink" / "manifest.json").read_text())
    assert manifest["total_rows"] == 100
    assert len(manifest["files"]) == 7
    got = []
    for e in manifest["files"]:
        raw = (tmp_path / "sink" / "data" / e["file"]).read_bytes()
        assert hashlib.md5(raw).hexdigest() == e["md5"]
        rows = [json.loads(line) for line in raw.splitlines()]
        assert len(rows) == e["n_rows"]
        got.extend((r["k"], r["v"]) for r in rows)
    assert sorted(got) == [(i, i * 3) for i in range(100)]
    # no stray temp files survive the commit
    assert not list((tmp_path / "sink" / "_tmp").glob("*")) or not (
        tmp_path / "sink" / "_tmp"
    ).exists()


def test_manifest_jsonl_writer_abort_publishes_nothing(spark, tmp_path):
    """A failing task must leave the target unpublished: no manifest, no
    data files — the manifest IS the commit point."""
    import pyspark

    from tubes_spark import datasource

    datasource.register(spark)
    out = str(tmp_path / "sink_fail")

    def boom(v):
        raise RuntimeError("injected write failure")

    from pyspark.sql import functions as SF

    bad = spark.range(10).select(
        SF.udf(boom, "long")(SF.col("id")).alias("k")
    )
    try:
        bad.write.format("manifest_jsonl").option("path", out).mode(
            "append"
        ).save()
        raise AssertionError("write should have failed")
    except Exception as ex:
        assert not isinstance(ex, AssertionError)
    assert not (tmp_path / "sink_fail" / "manifest.json").exists()
    assert not list((tmp_path / "sink_fail").glob("data/*"))


def test_tombstone_propagation_is_complete(spark):
    """The compliance property behind the audit numbers: NO tombstoned
    doc may survive anywhere in the kept chunk store, and the audit's
    removed mass must equal exactly the tombstoned docs' chunk mass."""
    from tubes_spark import queries as Q
    from tubes_spark.catalog import load_table

    sf = "/root/testdata/sf0.001"
    audit = {r.shard: r for r in Q.tombstone_delete_propagation(spark, sf).collect()}
    chunks = Q.chunk_documents_ctx(spark, sf)
    tomb = {
        r.doc_id
        for r in load_table(spark, "documents", sf)
        .filter(F.col("doc_id") % 97 == 0)
        .select("doc_id")
        .collect()
    }
    rows = chunks.select("doc_id", "n_tokens").collect()
    for shard in range(8):
        shard_rows = [r for r in rows if r.doc_id % 8 == shard]
        dead = [r for r in shard_rows if r.doc_id in tomb]
        a = audit[shard]
        assert a.chunks_before == len(shard_rows)
        assert a.chunks_removed == len(dead)
        assert a.chunks_after == len(shard_rows) - len(dead)
        assert a.tokens_before - a.tokens_after == sum(r.n_tokens for r in dead)
        assert a.docs_removed == len({r.doc_id for r in dead})


def test_png_ahash_query_deterministic(spark):
    from tubes_spark import queries as Q

    a = {r.media_id: r.ahash for r in Q.multimodal_png_ahash(spark, "/root/testdata/sf0.001").collect()}
    b = {r.media_id: r.ahash for r in Q.multimodal_png_ahash(spark, "/root/testdata/sf0.001").collect()}
    assert a == b and len(a) == 500
    assert all(len(v) == 16 for v in a.values())
