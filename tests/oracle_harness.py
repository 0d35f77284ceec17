"""Local mirror of the driver's correctness gate: run a Spark query and
its DuckDB oracle on the same sf dir, compare row count, sorted columns,
and values (exact — the driver hashes, so near-misses are failures here too)."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from tubes_spark.catalog import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, sql: str, sf_dir: str) -> tuple[bool, str]:
    sp = spark_df.toPandas()
    con = duck_con(sf_dir)
    du = con.execute(sql).fetchdf()
    con.close()
    if len(sp) != len(du):
        return False, f"row count: spark={len(sp)} duckdb={len(du)}"
    if sorted(sp.columns) != sorted(du.columns):
        return False, f"columns: spark={sorted(sp.columns)} duckdb={sorted(du.columns)}"
    a, b = _norm(sp), _norm(du)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            # The driver hashes values as-is, so an int64 column on one
            # side vs float64 on the other (DuckDB HUGEINT sums, Spark
            # Decimal outputs) is a mismatch even when numerically equal.
            if av.dtype.kind != bv.dtype.kind:
                return False, f"col {c}: dtype kind: spark={av.dtype} duckdb={bv.dtype}"
            av = av.astype(float)
            bv = bv.astype(float)
            import numpy as np

            # exact equality including the sign of zero (-0.0 != 0.0 for a hash)
            bad = ~((av.isna() & bv.isna())
                    | ((av == bv) & (np.signbit(av.fillna(0.0)) == np.signbit(bv.fillna(0.0)))))
            if bad.any():
                i = bad.idxmax()
                return False, f"col {c}: first diff at row {i}: {av[i]!r} vs {bv[i]!r} (n={int(bad.sum())})"
        elif av.dtype.kind in "iu" and bv.dtype.kind in "iu":
            # The driver hashes values dtype-sensitively, so int32 vs
            # int64 is a mismatch even when numerically equal — require
            # full dtype equality so width drift surfaces locally.
            if av.dtype != bv.dtype:
                return False, f"col {c}: int dtype width: spark={av.dtype} duckdb={bv.dtype}"
            if not av.equals(bv):
                bad = av != bv
                i = bad.idxmax()
                return False, f"col {c}: first diff at row {i}: {av[i]!r} vs {bv[i]!r} (n={int(bad.sum())})"
        else:
            if not av.astype(str).equals(bv.astype(str)):
                bad = av.astype(str) != bv.astype(str)
                i = bad.idxmax()
                return False, f"col {c}: first diff at row {i}: {av[i]!r} vs {bv[i]!r} (n={int(bad.sum())})"
    return True, f"ok ({len(sp)} rows)"
