"""A/B the round-12 `spark.sql.parquet.inferTimestampNTZ.enabled=false`
conf (round-12 VERDICT item 5): the claim was "NTZ micros timestamp
columns read as TimestampType directly, skipping the catalog's per-row
make_timestamp rewrite — 2x on lineitem scans", shipped unmeasured in
the final r12 commit.

`inferTimestampNTZ.enabled` is a runtime SQLConf, so ONE session can
interleave both settings (A B A B ...) — same JVM, same page cache,
same host window; per-setting best-of minimums compare plan cost, not
ambient noise. The catalog (catalog.py) branches per-DataFrame on the
observed schema: with inference ON the column arrives as TimestampNTZ
and the make_timestamp rewrite runs; with it OFF the column arrives as
TimestampType and the rewrite is skipped.

Run: python scripts/ntz_conf_probe.py [--rounds 3]
Prints one JSON line: {query: {"off": s, "on": s, "ratio_off_over_on": r}}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webscrap_datapipeline_spark.plans import REGISTRY  # noqa: E402
from webscrap_datapipeline_spark.session import get_spark  # noqa: E402

# Queries dominated by orders/lineitem/events scans (the three tables
# with micros-NTZ parquet timestamps), spanning scan-only, join and
# window shapes.
QUERIES = [
    "pricing_summary",
    "late_lines_by_returnflag",
    "nation_year_profit",
    "top_revenue_orders",
    "lineitem_sample_stats",
    "sliding_10min_5min_events",
    "asof_latest_order",
    "order_shipping_lag",
    "large_volume_orders",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    spark = get_spark(app_name="ntz-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    best: dict[str, dict[str, float]] = {q: {"off": 1e9, "on": 1e9} for q in QUERIES}
    for _ in range(args.rounds):
        for setting in ("off", "on"):
            spark.conf.set(
                "spark.sql.parquet.inferTimestampNTZ.enabled",
                "false" if setting == "off" else "true",
            )
            for name in QUERIES:
                q = REGISTRY[name]
                t0 = time.perf_counter()
                df = q.fn(spark, args.sf)
                df.count()
                best[name][setting] = min(
                    best[name][setting], time.perf_counter() - t0
                )
    out = {
        q: {
            "off": round(v["off"], 3),
            "on": round(v["on"], 3),
            "ratio_off_over_on": round(v["off"] / v["on"], 3) if v["on"] else None,
        }
        for q, v in best.items()
    }
    # restore the shipped default for any shared-session reuse
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
