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


def _kind(type_str: str) -> str:
    """Canonicalize a Spark dtype string OR a DuckDB logical-type string
    to one comparable kind token.

    The driver's order-insensitive value hash is TYPE-sensitive: DuckDB's
    windowed ``SUM`` yields HUGEINT (Arrow ``decimal128(38,0)``) which
    hash-differs from Spark's ``int64`` even when every value is equal
    (the q_pack_sequences red row in CORRECTNESS_r05).  Python-level row
    comparison masks exactly that class (``Decimal(123) == 123`` is
    True), so ``compare()`` also checks canonical per-column kinds.
    """
    t = type_str.strip().lower()
    if t.endswith("[]"):  # duckdb list syntax
        inner = _kind(t[:-2])
        return None if inner is None else f"list<{inner}>"
    if t.startswith("array<") and t.endswith(">"):
        inner = _kind(t[6:-1])
        return None if inner is None else f"list<{inner}>"
    if t.startswith("decimal") or t == "hugeint" or t == "uhugeint":
        return "decimal"
    mapping = {
        "bigint": "int64", "long": "int64", "ubigint": "int64",
        "integer": "int32", "int": "int32", "uinteger": "int32",
        "smallint": "int16", "usmallint": "int16",
        "tinyint": "int8", "utinyint": "int8",
        "double": "float64", "float": "float32", "real": "float32",
        "boolean": "bool", "bool": "bool",
        "varchar": "string", "string": "string", "text": "string",
        "blob": "binary", "binary": "binary", "bytea": "binary",
        "date": "date",
        "timestamp": "timestamp", "timestamp_ns": "timestamp",
        "timestamp_ms": "timestamp", "timestamp_s": "timestamp",
        "timestamp with time zone": "timestamp", "timestamptz": "timestamp",
    }
    # struct/map spellings canonicalize by PARSING both engines' syntax
    # to one kind token (ADVICE r7: skipping them entirely meant a real
    # Spark-vs-DuckDB type divergence inside a struct column could pass
    # locally and only fail at the driver):
    #   Spark  struct<a:bigint,b:array<int>> / map<string,bigint>
    #   DuckDB STRUCT(a BIGINT, b INTEGER[]) / MAP(VARCHAR, BIGINT)
    if t.startswith("struct<") and t.endswith(">"):
        return _struct_kind(_split_top(t[7:-1]), spark_syntax=True)
    if t.startswith("struct(") and t.endswith(")"):
        return _struct_kind(_split_top(t[7:-1]), spark_syntax=False)
    if (t.startswith("map<") and t.endswith(">")) or (
        t.startswith("map(") and t.endswith(")")
    ):
        kv = _split_top(t[4:-1])
        if len(kv) == 2:
            k, v = _kind(kv[0]), _kind(kv[1])
            if k is not None and v is not None:
                return f"map<{k},{v}>"
        return None
    # None = still-unmapped (interval / engine-specific spellings):
    # compare() degrades those columns to a values-only check with a
    # warning instead of failing on a spelling difference (ADVICE r6).
    return mapping.get(t)


def _split_top(s: str) -> list[str]:
    """Split on commas at bracket depth 0 (both <> and () nest)."""
    parts: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in s:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def _struct_kind(fields: list[str], spark_syntax: bool) -> str | None:
    """Canonical ``struct<name:kind,...>`` from either engine's field
    list; None if any field's type has no canonical kind (the whole
    column then degrades to the values-only check)."""
    out = []
    for f in fields:
        f = f.strip()
        if spark_syntax:  # name:type, colon at depth 0
            depth = 0
            for i, ch in enumerate(f):
                if ch in "<(":
                    depth += 1
                elif ch in ">)":
                    depth -= 1
                elif ch == ":" and depth == 0:
                    name, ftype = f[:i], f[i + 1:]
                    break
            else:
                return None
        else:  # name TYPE (name possibly double-quoted)
            if f.startswith('"'):
                end = f.find('"', 1)
                if end < 0:
                    return None
                name, ftype = f[1:end], f[end + 1:]
            else:
                sp = f.find(" ")
                if sp < 0:
                    return None
                name, ftype = f[:sp], f[sp + 1:]
        fk = _kind(ftype)
        if fk is None:
            return None
        out.append(f"{name.strip().lower()}:{fk}")
    return "struct<" + ",".join(out) + ">"


def _norm(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "nan")
        return ("float", float(v))
    # struct values: Spark collects a Row (named tuple), DuckDB a dict --
    # normalize both to a field-name-sorted tuple so equal structs compare
    # equal (they reach the values-only path via the unmapped-kind degrade)
    if hasattr(v, "__fields__"):  # pyspark Row
        return tuple(_norm(x) for _, x in sorted(zip(v.__fields__, v)))
    if isinstance(v, dict):
        return tuple(_norm(x) for _, x in sorted(v.items()))
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
    d_types = [str(t) for t in rel.types]
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
    # Typed check: reproduce the driver's hash type-sensitivity locally
    # (HUGEINT/decimal drift passes Python == but fails the driver hash).
    s_types = dict(spark_df.dtypes)
    s_kinds = {c: _kind(t) for c, t in spark_df.dtypes}
    d_kinds = {c: _kind(t) for c, t in zip(d_cols, d_types)}
    # Columns whose type has no canonical kind on either side (struct/map/
    # interval/engine-specific spellings) fall back to the values-only
    # check below, reported as a warning -- a spelling mismatch there is
    # not evidence of a value mismatch (ADVICE r6).
    unchecked = sorted(
        c for c in s_kinds if s_kinds[c] is None or d_kinds.get(c) is None
    )
    if unchecked:
        result["type_unchecked"] = {
            c: (s_types.get(c), dict(zip(d_cols, d_types)).get(c))
            for c in unchecked
        }
    type_diff = {
        c: (s_kinds[c], d_kinds[c])
        for c in s_kinds
        if c not in unchecked and s_kinds[c] != d_kinds[c]
    }
    result["types_match"] = not type_diff
    if type_diff:
        result["type_diff"] = type_diff
    a, b = _rows(s_cols, s_rows), _rows(d_cols, d_rows)
    result["values_match"] = a == b
    result["ok"] = (
        result["values_match"]
        and result["types_match"]
        and len(s_rows) == len(d_rows)
    )
    if not result["ok"]:
        diff_a = [r for r in a if r not in set(b)][:5]
        diff_b = [r for r in b if r not in set(a)][:5]
        result["spark_only"] = diff_a
        result["duck_only"] = diff_b
    return result
