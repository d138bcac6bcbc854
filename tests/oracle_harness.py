"""Local re-implementation of the driver's t2 correctness gate.

Runs a queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet tables, then compares row count, schema width, and values — exactly
(not approximately) for every cell, because the driver compares via an
order-insensitive value hash. Columns are sorted by name and rows by all
columns before comparison, mirroring the driver.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in [
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
    ]:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _cell_equal(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        if isinstance(a, float) and isinstance(b, float) and math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a = list(a) if a is not None else a
        b = list(b) if b is not None else b
        return len(a) == len(b) and all(_cell_equal(x, y) for x, y in zip(a, b))
    return a == b


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    errs: list[str] = []
    spdf = spark_df.toPandas()
    a, b = _canon(spdf), _canon(oracle_pdf)
    if len(a) != len(b):
        errs.append(f"{name}: row count {len(a)} (spark) != {len(b)} (oracle)")
        return errs
    if list(a.columns) != list(b.columns):
        errs.append(f"{name}: columns {list(a.columns)} != {list(b.columns)}")
        return errs
    for c in a.columns:
        if a[c].dtype != b[c].dtype:
            errs.append(
                f"{name}: column {c!r} dtype {a[c].dtype} (spark) != {b[c].dtype} (oracle)"
            )
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(av, bv)) if not _cell_equal(x, y)
        ]
        if bad:
            i, x, y = bad[0]
            errs.append(
                f"{name}: column {c!r} differs in {len(bad)}/{len(av)} rows; "
                f"first at row {i}: spark={x!r} oracle={y!r}"
            )
    return errs
