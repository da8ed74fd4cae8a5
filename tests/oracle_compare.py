"""Local replica of the driver's DuckDB-oracle comparison.

Faithful to the driver's *pandas* canonicalization path — not an
idealized comparator. Round 2's postmortem (VERDICT.md "What's wrong"
#3): the old ``fetchall()``-based compare converted DuckDB HUGEINT to
Python int and tuple-sorted rows, so two whole classes of driver
failures never reproduced locally:

  * DuckDB ``SUM(int)`` → HUGEINT → pandas **float64** (``3882.0``)
    while Spark emits int64 (``3882``) — identical values, different
    dtypes, different hashes (``late_lines_by_returnflag``, red in
    r1 AND r2);
  * list-valued cells crash pandas ``sort_values``
    (``unhashable type: 'list'`` — ``label_centroids``, r2).

This version goes Spark→``toPandas()`` and DuckDB→``.df()`` (pandas),
sorts columns by name, canonicalizes rows via ``sort_values`` over all
columns (raising exactly where the driver raises), and compares cells
**dtype-sensitively**: an int64 cell never equals a float64 cell even
when the values coincide. If a query passes here, the driver's pandas
path has no type/shape artifact left to trip on.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from typing import Any

import duckdb
import numpy as np
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
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):
            # Spark-written layout (scripts/scaled_parity.py corpora):
            # the ".parquet" path is a directory of part files
            path = os.path.join(path, "*.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_cell(v: Any) -> Any:
    """Dtype-sensitive canonical form of one pandas cell.

    Integers and floats deliberately canonicalize DIFFERENTLY
    (``'i:3882'`` vs ``'f:3882.0'``): the driver hashes pandas values,
    where dtype is part of identity. Collapsing them here is exactly
    the bug that made round 2's red rows invisible locally.
    """
    if v is None:
        return "NULL"
    if isinstance(v, (np.ndarray, list, tuple)):
        # pandas can hold these, but the driver's sort_values raises on
        # them before any hashing happens; _sorted_rows reproduces that.
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NULL"  # pandas maps SQL NULL in numeric cols to NaN
        return f"f:{f + 0.0!r}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, pd.Timestamp):
        return v.tz_localize(None).isoformat(sep=" ") if v.tz is None else v.tz_convert("UTC").tz_localize(None).isoformat(sep=" ")
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_cell(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return f"x:{v.hex()}"
    if v is pd.NaT:
        return "NULL"
    return v


def _sorted_rows(pdf: pd.DataFrame) -> list[tuple]:
    """Column-name sort + pandas sort_values — the driver's canonical
    order. sort_values raises TypeError on unhashable cells (lists);
    we let that propagate so list-shaped outputs fail HERE, not in the
    driver."""
    pdf = pdf.reindex(sorted(pdf.columns, key=lambda c: c.lower()), axis=1)
    if len(pdf.columns) and len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    # Canonical-form sort as a final tiebreak: sort_values on mixed
    # dtypes can order NaN/None differently across engines.
    rows.sort(key=repr)
    return rows


def _multiset_digest(pdf: pd.DataFrame, mod: int = 1 << 127) -> int:
    """Order-independent digest of a canonicalized frame chunk: md5 of
    each canonical row, summed mod 2¹²⁷ — equal multisets of rows give
    equal sums; unequal ones collide with probability ~2⁻¹²⁷."""
    import hashlib

    total = 0
    for row in pdf.itertuples(index=False, name=None):
        canon = tuple(_canon_cell(v) for v in row)
        total = (
            total
            + int.from_bytes(hashlib.md5(repr(canon).encode()).digest(), "big")
        ) % mod
    return total


def compare_hashed(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    """Chunked multiset-hash comparison for REPLICATED-scale sweeps
    (round-11 VERDICT item 7): the faithful :func:`compare` pays two
    full materializations plus two O(n log n) mixed-dtype pandas sorts
    — at ×64 replication the comparator, not the engines, dominated
    the sweep wall (event_lag_deltas: 221.8 s oracle-side vs
    engine-side seconds). This mode keeps the IDENTICAL per-cell
    canonicalization (dtype-sensitive — the part that catches real
    mismatches) but replaces sort-and-compare with an
    order-independent md5-multiset digest, streamed from DuckDB in
    arrow-sized chunks so the oracle result is never fully
    materialized. Same verdicts up to a ~2⁻¹²⁷ collision.

    Deliberately NOT driver-faithful on one quirk: the driver (and
    :func:`compare`) crash on list-valued cells in ``sort_values``;
    hashing has no sort, so list outputs pass here. Use this mode for
    large-factor sweeps only, after the faithful mode vetted the same
    queries at small factor."""
    res: dict[str, Any] = {"mode": "hashed"}
    try:
        s_pdf = spark_df.toPandas()
    except Exception as exc:
        return {"ok": False, "err": f"fetch: {type(exc).__name__}: {exc}"}
    s_cols = sorted(s_pdf.columns, key=lambda c: c.lower())
    s_hash = _multiset_digest(s_pdf.reindex(s_cols, axis=1))
    s_rows = len(s_pdf)
    del s_pdf

    try:
        cur = con.execute(sql)
        d_cols_raw = [d[0] for d in cur.description]
        d_cols = sorted(d_cols_raw, key=lambda c: c.lower())
        d_hash, d_rows = 0, 0
        while True:
            chunk = cur.fetch_df_chunk()
            if chunk is None or len(chunk) == 0:
                break
            d_hash = (d_hash + _multiset_digest(chunk.reindex(d_cols, axis=1))) % (
                1 << 127
            )
            d_rows += len(chunk)
    except Exception as exc:
        return {"ok": False, "err": f"fetch: {type(exc).__name__}: {exc}"}

    res.update(spark_rows=s_rows, duck_rows=d_rows, spark_cols=s_cols, duck_cols=d_cols)
    res["cols_ok"] = [c.lower() for c in s_cols] == [c.lower() for c in d_cols]
    res["count_ok"] = s_rows == d_rows
    res["values_ok"] = s_hash == d_hash
    res["ok"] = bool(res["cols_ok"] and res["count_ok"] and res["values_ok"])
    return res


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    """Returns dict with 'ok' plus diagnostics. Mirrors the driver:
    row count, column-name set, then dtype-sensitive value equality
    over pandas-canonicalized rows."""
    res: dict[str, Any] = {}
    try:
        s_pdf = spark_df.toPandas()
        d_pdf = con.sql(sql).df()
    except Exception as exc:  # mirror the driver's err column
        return {"ok": False, "err": f"fetch: {type(exc).__name__}: {exc}"}

    s_cols = list(s_pdf.columns)
    d_cols = list(d_pdf.columns)
    res.update(
        spark_rows=len(s_pdf),
        duck_rows=len(d_pdf),
        spark_cols=sorted(s_cols),
        duck_cols=sorted(d_cols),
    )
    res["cols_ok"] = sorted(c.lower() for c in s_cols) == sorted(c.lower() for c in d_cols)
    res["count_ok"] = len(s_pdf) == len(d_pdf)
    if not (res["cols_ok"] and res["count_ok"]):
        res["ok"] = False
        return res

    try:
        sn = _sorted_rows(s_pdf)
        dn = _sorted_rows(d_pdf)
    except TypeError as exc:
        # the driver's `unhashable type: 'list'` class of failure
        res["ok"] = False
        res["err"] = f"canonicalize: {exc}"
        return res

    res["values_ok"] = sn == dn
    if not res["values_ok"]:
        diff = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        res["first_diffs"] = diff
    res["ok"] = bool(res["values_ok"])
    return res
