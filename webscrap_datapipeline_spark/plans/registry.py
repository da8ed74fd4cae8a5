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


def _driver_history() -> tuple[dict[str, int], frozenset[str], int]:
    """({name: last round with a green hash row}, driver-seen names,
    latest round with a committed CORRECTNESS file — 0 when none),
    derived from the committed CORRECTNESS_r*.json files rather than a
    hand-maintained list (round-2 ADVICE: a hard-coded frozenset
    silently drifts from the actual driver record). Missing/corrupt
    files degrade to empty — every query then competes for a window
    slot, which is the safe direction. The latest round is a tuple
    element, not a module global (round-4 ADVICE: a global set as a
    side effect reads stale-0 for callers that never invoked this)."""
    import json
    import os
    import re

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    last_green: dict[str, int] = {}
    seen: set[str] = set()
    latest_round = 0
    for fname in sorted(os.listdir(repo_root)):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fname)
        if not m:
            continue
        rnd = int(m.group(1))
        latest_round = max(latest_round, rnd)
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
                last_green[name] = max(last_green.get(name, 0), rnd)
    return last_green, frozenset(seen), latest_round

# Queries added MID-round, after the current window's 50-slot budget was
# already allocated. A deferred query sorts LAST until the CORRECTNESS
# file of the round before its target exists, then it automatically
# joins bucket 1 (oracled, never green) for the target round's window.
# Local parity still covers it every pytest run in the meantime.
# (Round-6 prune: the r4/r5 entries all landed green rows and retired —
# VERDICT r5 "What's wrong" item 1. Empty ≠ dead: repopulate whenever a
# query is added mid-round.)
_DEFER_TO_ROUND: dict[str, int] = {
    # round 9 added five partsupp-twin queries but the window holds
    # 50 = 1 pin + 45 stale-r6 rotation slots + 4 new: Q2 (the fifth,
    # added last) defers to round 10 so no r6-era row loses its slot —
    # the freshness floor outranks one round of driver latency. Local
    # parity (sf0.001/0.1), ×64 scaled parity, and the determinism
    # audit already prove it this round.
    "min_cost_region_suppliers": 10,
}

# Queries whose PLAN or ORACLE changed in the round named by the pin —
# already verified in an earlier round, but the verified code is not the
# committed code anymore, so a fresh driver row outranks re-greening
# stale-but-unchanged queries. A pin retires once the driver records a
# green row in a round >= its pin round (then it rejoins the normal
# least-recently-verified rotation). Round-6 prune cleared the retired
# r4/r5 pins; repopulate whenever a shipped plan/oracle changes.
_PINNED_FIRST: dict[str, int] = {
    # (Round-8 prune: the three r7 pins — cross_modal_curation_stats,
    # simhash_documents, simhash_near_dup_pairs — landed green rows in
    # CORRECTNESS_r07 and retired. For the record, corrected per round-7
    # ADVICE: the two simhash consumers were routed through the new
    # wide/narrow flag and the extracted simhash_bit_band_keys helper
    # while KEEPING the explode plan (wide=False — the wide 63-buffer
    # aggregate's ~0.7 s codegen compile constant dominates 100-doc
    # slices); the wide aggregate serves corpus-scale probe calls.
    # Repopulate whenever a shipped plan/oracle changes.)
    #
    # (Round-9 prune: the two r8 pins — lsh_auto_planes_volume,
    # simhash_near_dup_pairs — landed green rows in CORRECTNESS_r08
    # and retired.)
    #
    # round 9: nation_year_profit upgraded in place from the
    # retailprice-proxy Q9 to the TRUE Q9 over the synthesized
    # partsupp twin (plan AND oracle changed — unit cost now
    # ps_supplycost_cents/100 joined on the composite key); re-verify
    # under the driver.
    "nation_year_profit": 9,
}


def _ordered_names() -> list[str]:
    last_green, seen, latest_round = _driver_history()

    def rank(name: str) -> tuple[int, int, int]:
        q = REGISTRY[name]
        mod = q.fn.__module__.rsplit(".", 1)[-1]
        if name in _DEFER_TO_ROUND and latest_round < _DEFER_TO_ROUND[name] - 1:
            bucket = 9  # mid-round addition: yields this window entirely
        elif name in _PINNED_FIRST and last_green.get(name, 0) < _PINNED_FIRST[name]:
            bucket = 0  # plan/oracle changed this round — re-verify first
        elif q.oracle is not None and name not in last_green:
            bucket = 1  # exact check available but no green driver row yet
        elif q.oracle is None and name not in seen:
            bucket = 2  # rows-only, never even driver-seen
        elif q.oracle is not None:
            bucket = 3  # hash-verified: least-recently-verified first, so
            # the window is a rotating re-verification budget (round-3
            # VERDICT item 1 — evidence freshness, oldest rows first)
        else:
            bucket = 4  # rows-only, already driver-seen: a repeat rows-only
            # check adds nothing, so these yield their slots to the
            # hash-verified rotation
        age = last_green.get(name, 0) if bucket == 3 else 0
        return (bucket, age, _MODULE_RANK.get(mod, 99))

    return sorted(REGISTRY, key=rank)  # stable: insertion order within a bucket


def queries() -> dict[str, QueryFn]:
    return {n: REGISTRY[n].fn for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {n: REGISTRY[n].oracle for n in _ordered_names() if REGISTRY[n].oracle is not None}
