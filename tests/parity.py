"""Local replica of the driver's DuckDB-oracle comparison.

For a query name: run the Spark DataFrame and the oracle SQL on the same
parquet tables, sort columns by name, sort rows, and compare values exactly
(floats bit-compared after both engines' own round(…, 4) — any residual
difference would break the driver's value-hash, so we fail on it here).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            continue
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _cell_eq(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def compare(name: str, spark_df, sql: str, sf_dir: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty = parity)."""
    errors: list[str] = []
    sp = spark_df.toPandas()
    con = duckdb_con(sf_dir)
    try:
        du = con.execute(sql).fetchdf()
    finally:
        con.close()
    if sorted(sp.columns) != sorted(du.columns):
        return [f"{name}: columns differ spark={sorted(sp.columns)} duckdb={sorted(du.columns)}"]
    if len(sp) != len(du):
        errors.append(f"{name}: row count spark={len(sp)} duckdb={len(du)}")
        return errors
    sp, du = _normalize(sp), _normalize(du)
    for c in sp.columns:
        sa, da = sp[c].tolist(), du[c].tolist()
        bad = [(i, x, y) for i, (x, y) in enumerate(zip(sa, da)) if not _cell_eq(x, y)]
        if bad:
            i, x, y = bad[0]
            errors.append(f"{name}: column {c}: {len(bad)} cells differ, first row {i}: spark={x!r} duckdb={y!r}")
    return errors
