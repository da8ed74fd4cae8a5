"""Query registry — the driver-contract backbone.

Each query is a named pair (Spark plan builder, DuckDB oracle SQL).
``__spark_entry__.py`` exposes the registry to the driver; the pytest
suite runs the same comparison locally (row count + schema + order-
insensitive value hash) so the driver's correctness gate is never a
surprise.

Determinism rules every query follows (why: the oracle compare is an
exact value-hash, and Spark sums floats in partition order):
  * double aggregates go through DECIMAL (exact, order-independent),
    then one final cast to double that both engines perform on the same
    exact value;
  * averages are written as exact-decimal-sum / count — one identical
    IEEE division on both sides, never engine-internal ``avg``;
  * any top-k has a total-order tiebreak key;
  * dedup-by-key uses aggregation or row_number with a total order,
    never "keep whichever row came first".
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None, tags: tuple[str, ...] = (), doc: str = ""):
    """Register a (spark_fn, oracle_sql) pair under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


# Driver-facing ordering. The driver's correctness gate verifies a prefix
# of the registry (50 entries per round), so the export order is an
# evidence-allocation decision: queries without a green driver row yet go
# first; hash-verified queries (they keep local pytest parity) go last.
_MODULE_RANK = {
    "text_queries": 0,
    "crossmodal_queries": 0,  # cross-channel curation flagship
    "curation_queries": 1,  # round-3 curation surface — all driver-unseen
    "vector_queries": 1,
    "temporal_queries": 2,
    "multimodal_queries": 3,
    "sql_surface_queries": 4,
    "core_queries": 5,
    "analytics_queries": 6,
}


def _driver_history() -> tuple[frozenset[str], frozenset[str]]:
    """(hash-verified names, driver-seen names), derived from the
    committed CORRECTNESS_r*.json files rather than a hand-maintained
    list (round-2 ADVICE: a hard-coded frozenset silently drifts from
    the actual driver record). Missing/corrupt files degrade to empty
    sets — every query then competes for a window slot, which is the
    safe direction."""
    import json
    import os

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    verified: set[str] = set()
    seen: set[str] = set()
    for fname in sorted(os.listdir(repo_root)):
        if not (fname.startswith("CORRECTNESS_r") and fname.endswith(".json")):
            continue
        try:
            with open(os.path.join(repo_root, fname)) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            seen.add(name)
            if isinstance(row, dict) and row.get("hash_match") is True:
                verified.add(name)
    return frozenset(verified), frozenset(seen)


# Queries re-shaped THIS round to clear a driver-comparator artifact
# (r2 red rows + the array-output query the faithful local comparator
# flagged) — their fresh driver row is the round's first deliverable.
_PINNED_FIRST = ("late_lines_by_returnflag", "label_centroids", "user_event_type_sets")


def _ordered_names() -> list[str]:
    verified, seen = _driver_history()

    def rank(name: str) -> tuple[int, int, int]:
        q = REGISTRY[name]
        mod = q.fn.__module__.rsplit(".", 1)[-1]
        if name in _PINNED_FIRST and name not in verified:
            # self-retiring: once the driver records a green row for a
            # pinned query, its pin stops consuming a window slot
            bucket = 0
        elif q.oracle is not None and name not in verified:
            bucket = 1  # exact check available but no green driver row yet
        elif q.oracle is None and name not in seen:
            bucket = 2  # rows-only, never even driver-seen
        elif q.oracle is None:
            bucket = 3  # rows-only, already driver-seen; re-check adds nothing
        else:
            bucket = 4  # hash-verified; local parity keeps watching it
        return (bucket, _MODULE_RANK.get(mod, 99), 0)

    return sorted(REGISTRY, key=rank)  # stable: insertion order within a bucket


def queries() -> dict[str, QueryFn]:
    return {n: REGISTRY[n].fn for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {n: REGISTRY[n].oracle for n in _ordered_names() if REGISTRY[n].oracle is not None}
