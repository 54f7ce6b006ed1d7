"""Local replica of the driver's correctness gate: run every queries() entry
on Spark AND its oracle_sql() on DuckDB over the same parquet, compare
row-count, column names, and order-insensitive values.

Comparison: sort columns by name, normalize cells (Decimal→str, float→repr,
timestamp→isoformat), sort rows, compare. Mismatches mean the driver's
value-hash check would fail too.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
from typing import Any

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm_cell(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "float:nan"
        return f"float:{v!r}"
    if isinstance(v, datetime.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, (bool,)):
        return f"bool:{v}"
    if isinstance(v, (int,)):
        return f"int:{v}"
    return str(v)


def _normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False):
        out.append(tuple(_norm_cell(v) for v in row))
    out.sort(key=lambda r: tuple(str(x) for x in r))
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    sp = spark_df.toPandas()
    du = con.sql(sql).df()
    if sorted(sp.columns) != sorted(du.columns):
        return False, f"columns differ: spark={sorted(sp.columns)} duck={sorted(du.columns)}"
    if len(sp) != len(du):
        return False, f"row counts differ: spark={len(sp)} duck={len(du)}"
    a, b = _normalize(sp), _normalize(du)
    if a != b:
        diffs = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
        detail = "; ".join(f"row {i}: spark={a[i]} duck={b[i]}" for i in diffs)
        return False, f"values differ ({sum(x != y for x, y in zip(a, b))} rows): {detail}"
    return True, "ok"
