"""Repeat the BENCH's exact measurement (fn build + count) for chosen
queries in one JVM, splitting plan-build time from execution time per
attempt — shows whether a query's bench seconds are compute or repeated
driver-side constants (guide §1).

Usage: python scripts/bench_repeat_probe.py q1 q2 ... [--reps N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webscrap_datapipeline_spark.plans import REGISTRY  # noqa: E402
from webscrap_datapipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark(app_name="bench-repeat-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    for name in args.queries:
        q = REGISTRY[name]
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.perf_counter()
            df = q.fn(spark, args.sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            print(
                f"{name} rep{i}: total={t2 - t0:.3f} build={t1 - t0:.3f} "
                f"exec={t2 - t1:.3f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
