"""Regression tests pinning the round-5 review (ADVICE.md r4) fixes:

* catalog._load_events must survive an INT64 TIMESTAMP(NANOS) events
  parquet: the first read raises AnalysisException [PARQUET_TYPE_ILLEGAL]
  eagerly, so the nanosAsLong fallback has to be reached via try/except,
  not via a dtype check that never runs.
* knn_pq metric space: codebooks/codes must live in the same (unit-norm)
  space as the queries, so ADC ranking is cosine-consistent.
* JPEG header walker must not read a segment length for length-less
  markers (EOI/SOS/fill bytes) and must survive 0xFF fill runs.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tubes_spark.catalog import load_table


def _write_events_ns(path: str) -> None:
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(
                np.array(
                    ["2024-01-01T00:00:00.123456789", "2024-01-01T01:00:00", "2024-01-01T02:00:00"],
                    dtype="datetime64[ns]",
                ),
                pa.timestamp("ns"),
            ),
            "user_id": pa.array([10, 11, 12], pa.int64()),
            "event_type": pa.array(["view", "click", "purchase"]),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(tbl, path, store_schema=False)


def test_load_events_nanos_parquet_falls_back(spark, tmp_path):
    """A nanos-stored events.parquet must load, with ts a TIMESTAMP column
    truncated to micros (DuckDB's TIMESTAMP_NS -> TIMESTAMP mapping)."""
    sf_dir = str(tmp_path)
    _write_events_ns(os.path.join(sf_dir, "events.parquet"))
    df = load_table(spark, "events", sf_dir)
    assert dict(df.dtypes)["ts"] == "timestamp"
    rows = df.orderBy("event_id").collect()
    assert len(rows) == 3
    # nanos truncated to micros, value preserved
    assert rows[0]["ts"].microsecond == 123456


def test_load_events_micros_still_direct(spark):
    """The fast path (micros, no NTZ cast) must still produce TIMESTAMP."""
    df = load_table(spark, "events", "/root/testdata/sf0.001")
    assert dict(df.dtypes)["ts"] == "timestamp"


# ------------------------------------------------------- PQ metric consistency

def test_pq_adc_cosine_consistent_under_magnitude_skew(spark):
    """Scaling corpus vectors by arbitrary positive magnitudes must not
    change the ADC ranking (cosine is scale-invariant; before the fix,
    codebooks lived in raw space while queries were unit-norm, so
    magnitude skew wrecked the shortlist)."""
    from pyspark.sql import functions as F

    from tubes_spark.catalog import load_table as lt
    from tubes_spark.operators import similarity

    emb = lt(spark, "embeddings", "/root/testdata/sf0.001")
    # scale each vector by 1 + (vec_id % 7): cosine geometry unchanged
    scaled = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x * (F.lit(1.0) + (F.col("vec_id") % 7))
        ).alias("embedding"),
    )
    q = scaled.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_bruteforce(scaled, q, k=10).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_pq_adc(
            scaled, q, dim=64, k=10, m=8, n_codes=64, rerank=50
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"recall {recall}"


# ----------------------------------------------------------- JPEG marker walk

def _sof0(w: int, h: int) -> bytes:
    return (
        b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x03" + bytes(9)
    )


def test_jpeg_dims_with_fill_byte_runs(spark_noop=None):
    from tubes_spark.operators.multimodal import parse_media_header

    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + bytes(9)
    # 0xFF fill run before the APP0 marker and before SOF0
    b = b"\xff\xd8" + b"\xff\xff" + app0[1:] + b"\xff\xff\xff" + _sof0(640, 480)[1:]
    assert parse_media_header(b) == ("image/jpeg", 640, 480, None)


def test_jpeg_eoi_before_sof_returns_null_dims():
    """EOI has no length bytes; the old walker read garbage there and
    could jump anywhere.  A scan-less truncated JPEG must degrade to
    NULL dims, never crash or misparse."""
    from tubes_spark.operators.multimodal import parse_media_header

    b = b"\xff\xd8" + b"\xff\xd9" + _sof0(123, 45)
    assert parse_media_header(b) == ("image/jpeg", None, None, None)


def test_jpeg_sos_stops_walk():
    """Entropy-coded data after SOS may contain 0xFFC0-looking byte
    pairs; the walker must stop at SOS rather than 'find' a fake SOF."""
    from tubes_spark.operators.multimodal import parse_media_header

    sos = b"\xff\xda" + (8).to_bytes(2, "big") + bytes(6)
    fake_sof_in_scan = _sof0(9999, 9999)
    b = b"\xff\xd8" + sos + fake_sof_in_scan
    assert parse_media_header(b) == ("image/jpeg", None, None, None)


# ------------------------------------------------------------- BMP decoding

def _bmp_bytes(rgb_rows, top_down=False):
    """Assemble a 24bpp BMP from [[(r,g,b),...],...] (top-down order)."""
    h, w = len(rgb_rows), len(rgb_rows[0])
    stride = (3 * w + 3) // 4 * 4
    rows = rgb_rows if top_down else rgb_rows[::-1]
    px = b""
    for row in rows:
        line = b"".join(bytes([b_, g, r]) for (r, g, b_) in row)
        px += line + bytes(stride - 3 * w)
    hdr = (
        b"BM" + (54 + len(px)).to_bytes(4, "little") + bytes(4) + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little") + w.to_bytes(4, "little")
        + (h if not top_down else -h).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little") + bytes(4)
        + len(px).to_bytes(4, "little") + bytes(16)
    )
    return hdr + px


GRADIENT = [
    [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
    [(1, 2, 3), (4, 5, 6), (7, 8, 9)],
]


def test_bmp_decode_bottom_up_gradient():
    import numpy as np

    from tubes_spark.operators.multimodal import decode_bmp

    arr = decode_bmp(_bmp_bytes(GRADIENT))
    assert arr.shape == (2, 3, 3)
    assert np.array_equal(arr, np.array(GRADIENT, dtype=np.uint8))


def test_bmp_decode_top_down_gradient():
    import numpy as np

    from tubes_spark.operators.multimodal import decode_bmp

    arr = decode_bmp(_bmp_bytes(GRADIENT, top_down=True))
    assert np.array_equal(arr, np.array(GRADIENT, dtype=np.uint8))


def test_bmp_mean_rgb_exact():
    from tubes_spark.operators.multimodal import bmp_mean_rgb

    means = bmp_mean_rgb(_bmp_bytes(GRADIENT))
    flat = [px for row in GRADIENT for px in row]
    for ch in range(3):
        assert means[ch] == sum(p[ch] for p in flat) / len(flat)


def test_bmp_decode_rejects_garbage():
    import pytest as _pytest

    from tubes_spark.operators.multimodal import decode_bmp

    with _pytest.raises(ValueError):
        decode_bmp(b"not a bmp at all")
    with _pytest.raises(ValueError):
        decode_bmp(_bmp_bytes(GRADIENT)[:40])  # truncated


def test_jpeg_normal_header_still_parses():
    from tubes_spark.operators.multimodal import parse_media_header

    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + bytes(9)
    b = b"\xff\xd8" + app0 + _sof0(800, 600)
    assert parse_media_header(b) == ("image/jpeg", 800, 600, None)


# ------------------------------------------------ SpaceSaving eviction regime

def test_eviction_bound_query_really_evicts(spark):
    """The eviction-bound oracle query must run in the EVICTION regime
    (otherwise it degenerates to the exact case approx_top_tokens
    already covers): with ~997 cold keys against capacity 64, some
    merged summary entries must carry a nonzero overcount."""
    from pyspark.sql import functions as F

    from tubes_spark.catalog import load_table
    from tubes_spark.operators.sketch import space_saving_topk

    e = load_table(spark, "events", "/root/testdata/sf0.01")
    key = F.when(
        F.col("event_id") % 10 < 6,
        F.concat(F.lit("hot_"), (F.col("event_id") % 3).cast("string")),
    ).otherwise(
        F.concat(F.lit("cold_"), (F.col("event_id") % 997).cast("string"))
    )
    sk = space_saving_topk(e.select(key.alias("tok")), "tok", k=500, capacity=64)
    rows = sk.collect()
    assert any(r["max_overcount"] > 0 for r in rows), "no eviction happened"
    # and the hot keys still dominate the estimates
    top3 = [r["tok"] for r in rows[:3]]
    assert sorted(top3) == ["hot_0", "hot_1", "hot_2"]
