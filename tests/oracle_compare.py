"""Local replica of the driver's DuckDB-oracle comparison.

Row count + column names + order-insensitive value comparison, with
columns sorted by name (mirroring the driver contract in
``__spark_entry__.py``'s module docstring). Exact equality on every cell
— the determinism rules in plans/registry.py exist so this is achievable
even for float aggregates.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
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


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # normalize -0.0 and represent exactly
        return repr(v + 0.0)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    return v


def _normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    """Returns dict with 'ok' plus diagnostics."""
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    res: dict[str, Any] = {
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "spark_cols": sorted(s_cols),
        "duck_cols": sorted(d_cols),
    }
    res["cols_ok"] = sorted(c.lower() for c in s_cols) == sorted(c.lower() for c in d_cols)
    res["count_ok"] = len(s_rows) == len(d_rows)
    if not (res["cols_ok"] and res["count_ok"]):
        res["ok"] = False
        return res

    sn = _normalize(s_rows, s_cols)
    dn = _normalize(d_rows, d_cols)
    res["values_ok"] = sn == dn
    if not res["values_ok"]:
        diff = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        res["first_diffs"] = diff
    res["ok"] = bool(res["values_ok"])
    return res
