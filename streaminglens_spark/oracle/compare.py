"""Local Spark-vs-DuckDB comparison harness.

Replicates the driver's t2 check (row-count + column names + order-insensitive
value equality) so operators can be verified locally at any scale factor
before the driver runs its own comparison.
"""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb
from pyspark.sql import DataFrame

from ..sources.loaders import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "nan")
        return ("float", float(v))
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def compare(spark_df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    result: dict[str, Any] = {
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "cols_match": sorted(s_cols) == sorted(d_cols),
        "spark_cols": s_cols,
        "duck_cols": d_cols,
    }
    if not result["cols_match"]:
        result["ok"] = False
        return result
    a, b = _rows(s_cols, s_rows), _rows(d_cols, d_rows)
    result["values_match"] = a == b
    result["ok"] = result["values_match"] and len(s_rows) == len(d_rows)
    if not result["ok"]:
        diff_a = [r for r in a if r not in set(b)][:5]
        diff_b = [r for r in b if r not in set(a)][:5]
        result["spark_only"] = diff_a
        result["duck_only"] = diff_b
    return result
