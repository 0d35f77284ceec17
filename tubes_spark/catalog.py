"""Table loader for the driver's deterministic parquet test tables.

``spark.read.parquet`` gives predicate pushdown + column pruning for
free; keep all filtering declarative so they reach the scan
(check with ``df.explain('formatted')`` -> PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SHIPPED: set[str] = set()


def ensure_workers_have_package(spark: SparkSession) -> None:
    """Ship tubes_spark to executor python workers via addPyFile.

    UDF closures reference module-level helpers, which cloudpickle
    serializes *by reference*; workers then need the package importable.
    The driver controls its own session/cwd, so we can't rely on
    PYTHONPATH — zipping the package and addPyFile-ing it is the same
    mechanism used for real cluster submission (--py-files)."""
    sc = spark.sparkContext
    app = sc.applicationId
    if app in _SHIPPED:
        return
    pkg_dir = Path(__file__).resolve().parent
    zip_path = os.path.join(tempfile.gettempdir(), f"tubes_spark_pkg_{os.getpid()}.zip")
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for py in sorted(pkg_dir.rglob("*.py")):
                zf.write(py, arcname=str(Path("tubes_spark") / py.relative_to(pkg_dir)))
    sc.addPyFile(zip_path)
    _SHIPPED.add(app)

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    ensure_workers_have_package(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _with_conf(spark: SparkSession, key: str, value: str):
    """Save/restore a SQL conf around a read — the conf is captured into
    the plan at schema-resolution time, so it must not leak onto the
    (possibly user-owned) session."""
    import contextlib

    @contextlib.contextmanager
    def _cm():
        try:
            prev = spark.conf.get(key)
        except Exception:
            prev = None
        spark.conf.set(key, value)
        try:
            yield
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)

    return _cm()


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """events.parquet across driver regenerations has stored its ``ts``
    either as INT64 TIMESTAMP(NANOS) or as micro-resolution TIMESTAMP
    without the UTC flag.  Handle both WITHOUT a per-row cast:

    - micros/no-UTC-flag: with ``inferTimestampNTZ`` left at its default
      the column reads as TIMESTAMP_NTZ and every downstream window/agg
      pays a per-row NTZ->LTZ cast that also breaks ts pushdown — the
      round-3 ``tumbling_hourly`` 2.9x regression (1.77s -> 0.36s at
      sf0.1 when removed).  Disabling inference for just this read makes
      the scan produce TIMESTAMP directly; the session timezone is
      pinned to UTC (session.py), so the reinterpretation is
      value-preserving and matches DuckDB's naive-TIMESTAMP view.
    - nanos: Spark's vectorized reader rejects INT64(NANOS) outright, so
      fall back to ``nanosAsLong`` and truncate to micros — exactly what
      DuckDB does mapping TIMESTAMP_NS to its micro TIMESTAMP.
    """
    try:
        with _with_conf(spark, "spark.sql.parquet.inferTimestampNTZ.enabled", "false"):
            df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
    except Exception as exc:  # AnalysisException [PARQUET_TYPE_ILLEGAL]
        # INT64 TIMESTAMP(NANOS) raises eagerly at schema resolution —
        # before any dtypes check — so the fallback must catch, not sniff.
        if "PARQUET_TYPE_ILLEGAL" not in str(exc) and "NANOS" not in str(exc):
            raise
        ts_type = None
    if ts_type == "timestamp":
        return df
    # nanos fallback (vectorized reader cannot produce these as timestamps)
    with _with_conf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true"):
        df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long")))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load_table(spark, t, sf_dir) for t in TABLES}
