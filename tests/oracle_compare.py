"""Differential comparator: Spark query result vs DuckDB oracle result.

Mirrors the driver's correctness check: row count, schema (column names,
sorted), and an order-insensitive value hash. Values are normalized the way
any sane comparator must (timestamp precision unified, NaN == NaN) but
floats are NOT rounded — the engine is responsible for producing
bit-identical doubles via exact-decimal arithmetic (functions/exact.py).
"""

from __future__ import annotations

import datetime as dt
import math
from typing import Any

import duckdb

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


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if hasattr(v, "to_pydatetime"):  # pandas Timestamp
        return v.to_pydatetime().replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, (int, str, bool, bytes)):
        return v
    # decimals and everything else: canonical string
    return str(v)


def _canonical_rows(columns: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols_sorted = [columns[i] for i in order]
    normed = [tuple(_norm(r[i]) for i in order) for r in rows]
    normed.sort(key=repr)
    return cols_sorted, normed


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    sc, sr = _canonical_rows(s_cols, s_rows)
    dc, dr = _canonical_rows(d_cols, d_rows)

    out = {
        "rowcount_match": len(sr) == len(dr),
        "schema_match": sc == dc,
        "values_match": sr == dr,
        "spark_rows": len(sr),
        "oracle_rows": len(dr),
        "spark_cols": sc,
        "oracle_cols": dc,
    }
    if not out["values_match"] and out["rowcount_match"] and out["schema_match"]:
        diffs = [(a, b) for a, b in zip(sr, dr) if a != b]
        out["first_diffs"] = diffs[:3]
    return out
