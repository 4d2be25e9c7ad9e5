"""Local emulation of the driver's DuckDB-oracle compare.

The driver runs each ``queries()[name]`` on Spark and ``oracle_sql()[name]``
on DuckDB over the same parquet tables, then compares row count + schema +
an order-insensitive value hash with columns sorted by name. This harness
reproduces that so mismatches surface in `pytest` before the driver runs.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            df[c] = col.map(lambda v: None if v is None else str(v))
        elif col.dtype.kind == "f":
            df[c] = col.map(lambda v: None if v is None or (isinstance(v, float) and math.isnan(v))
                            else round(float(v), 6))
        else:
            df[c] = col
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


def _dtype_sig(df: pd.DataFrame) -> dict:
    # The driver's schema compare is dtype-sensitive (e.g. DuckDB HUGEINT →
    # float64 vs Spark BIGINT → int64 fails it). Mirror that here, modulo
    # datetime unit (ns vs us is an Arrow artifact, not a schema diff).
    sig = {}
    for c in sorted(df.columns):
        s = str(df[c].dtype)
        sig[c] = "datetime64" if s.startswith("datetime64") else s
    return sig


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    sp_raw = spark_df.toPandas()
    con = duck_con(sf_dir)
    du_raw = con.execute(oracle_sql).df()
    con.close()
    assert _dtype_sig(sp_raw) == _dtype_sig(du_raw), (
        f"dtype mismatch: spark={_dtype_sig(sp_raw)} duck={_dtype_sig(du_raw)}")
    sp = _canon(sp_raw)
    du = _canon(du_raw)
    assert list(sp.columns) == list(du.columns), (
        f"column mismatch: spark={list(sp.columns)} duck={list(du.columns)}")
    assert len(sp) == len(du), f"row count mismatch: spark={len(sp)} duck={len(du)}"
    for c in sp.columns:
        a, b = sp[c], du[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            aa = pd.to_numeric(a, errors="coerce")
            bb = pd.to_numeric(b, errors="coerce")
            ok = ((aa - bb).abs() < 1e-6) | (aa.isna() & bb.isna())
        else:
            ok = (a.astype(str) == b.astype(str)) | (a.isna() & b.isna())
        if not ok.all():
            bad = (~ok).idxmax()
            raise AssertionError(
                f"value mismatch col={c} row={bad}: spark={a[bad]!r} duck={b[bad]!r}\n"
                f"spark row: {sp.iloc[bad].to_dict()}\nduck row: {du.iloc[bad].to_dict()}")
