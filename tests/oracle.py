"""Local DuckDB-oracle parity checker (mirrors the driver's t2 gate:
row-count + schema + order-insensitive value comparison)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

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


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    sort_cols = list(df.columns)
    df = df.sort_values(sort_cols, kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def compare(spark_df, oracle_sql: str, sf_dir: str, rel_tol: float = 1e-9) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    problems: list[str] = []
    sp = spark_df.toPandas()
    con = duckdb_con(sf_dir)
    du = con.execute(oracle_sql).fetchdf()
    con.close()

    if sorted(sp.columns) != sorted(du.columns):
        return [f"columns differ: spark={sorted(sp.columns)} duckdb={sorted(du.columns)}"]
    if len(sp) != len(du):
        problems.append(f"row count differs: spark={len(sp)} duckdb={len(du)}")
        return problems

    sp, du = _norm(sp), _norm(du)
    for col in sp.columns:
        a, b = sp[col], du[col]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            bad = 0
            for x, y in zip(a, b):
                if pd.isna(x) and pd.isna(y):
                    continue
                if pd.isna(x) or pd.isna(y):
                    bad += 1
                elif not math.isclose(float(x), float(y), rel_tol=rel_tol, abs_tol=1e-9):
                    bad += 1
            if bad:
                problems.append(f"column {col}: {bad} float mismatches")
        else:
            mask = ~((a == b) | (a.isna() & b.isna()))
            if mask.any():
                i = mask.idxmax()
                problems.append(
                    f"column {col}: {int(mask.sum())} mismatches, first at row {i}: "
                    f"spark={a[i]!r} duckdb={b[i]!r}"
                )
    return problems
