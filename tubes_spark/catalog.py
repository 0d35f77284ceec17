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
        # events.parquet stores INT64 TIMESTAMP(NANOS), which Spark's
        # vectorized reader rejects.  Read nanos as long and truncate to
        # micros — exactly what DuckDB does when it maps TIMESTAMP_NS to
        # its micro-resolution TIMESTAMP, so both engines see equal values.
        # The conf is captured into the plan when `read.parquet` resolves
        # the schema, so it is saved/restored around just this read rather
        # than left set on the (possibly user-owned) session.
        key = "spark.sql.legacy.parquet.nanosAsLong"
        try:
            prev = spark.conf.get(key)
        except Exception:
            prev = None
        spark.conf.set(key, "true")
        try:
            df = spark.read.parquet(path)
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long")))
        elif ts_type == "timestamp_ntz":
            # Micro-resolution parquet without the UTC flag reads as
            # TIMESTAMP_NTZ under Spark's inferTimestampNTZ, which cannot
            # cast to numeric types.  The session timezone is pinned to
            # UTC (session.py), so reinterpreting as TIMESTAMP is
            # value-preserving and matches DuckDB's naive-TIMESTAMP view
            # of the same column.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load_table(spark, t, sf_dir) for t in TABLES}
