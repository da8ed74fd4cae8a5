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


def queries() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {n: q.oracle for n, q in REGISTRY.items() if q.oracle is not None}
