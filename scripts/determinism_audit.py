"""Run-twice determinism audit: execute every registered query twice
and require row-for-row identical results.

This is the audit class that exposed the round-3 ``assign_contiguous_ids``
bug (repartitionByRange boundary sampling differs per execution — any
plan evaluated twice must be materialized once), and it covers the
queries the value-hash gate cannot: the rows-only sketches/samplers and
any operator whose two-pass structure could drift between executions.
Unlike the oracle compare it needs no DuckDB and runs at any SF.

Round 3 ran this ad-hoc (SCALE.md "Run-twice determinism audit");
committed as a script so every later round re-runs it against the
operators it changed.

Run:  python scripts/determinism_audit.py [--sf /root/testdata/sf0.1]
      [--queries name1,name2]
Exit 1 on any query whose two executions differ.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webscrap_datapipeline_spark.plans import REGISTRY  # noqa: E402


def canon(rows) -> list[tuple]:
    out = [tuple(str(v) for v in r) for r in rows]
    out.sort()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default="")
    args = ap.parse_args()

    from webscrap_datapipeline_spark.session import get_spark

    spark = get_spark(app_name="determinism-audit")
    spark.sparkContext.setLogLevel("ERROR")
    names = [n for n in args.queries.split(",") if n] if args.queries else list(REGISTRY)
    fails = []
    for name in names:
        fn = REGISTRY[name].fn
        a = canon(fn(spark, args.sf).collect())
        b = canon(fn(spark, args.sf).collect())
        ok = a == b
        print(f"{name}: {'ok' if ok else 'NONDETERMINISTIC'} ({len(a)} rows)", flush=True)
        if not ok:
            fails.append(name)
            # Counter difference, not set difference: set() loses
            # multiplicity, so duplicate-row nondeterminism (same distinct
            # rows, different counts) printed EMPTY diffs (round-5 ADVICE).
            # Sort key is repr — mismatched rows can hold None, and
            # None < str raises TypeError mid-report.
            import collections

            print(f"  row counts: run1={len(a)} run2={len(b)}", flush=True)
            ca, cb = collections.Counter(a), collections.Counter(b)
            only_a = sorted((ca - cb).elements(), key=repr)[:3]
            only_b = sorted((cb - ca).elements(), key=repr)[:3]
            print(f"  only in run1 (with multiplicity): {only_a}", flush=True)
            print(f"  only in run2 (with multiplicity): {only_b}", flush=True)
    spark.stop()
    print(f"== determinism audit: {len(names) - len(fails)}/{len(names)} stable; FAILS={fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
