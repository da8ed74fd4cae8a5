"""Concurrent-query probe: does the engine serve a multi-tenant load?

The reference is a single-pipeline hourly ETL (reference src/main.py:24-58
runs one DAG end-to-end), so concurrency never arises there; an analytics
engine, by contrast, is expected to serve many simultaneous queries. On a
real cluster that is the Spark scheduler's job (FIFO stage interleaving,
or FAIR pools for tenant isolation); this probe measures the local[32]
twin of that behavior over real registry queries.

Method (same controls as the ×256 re-measurement in SCALE.md — one probe
process, page cache warmed by the solo phase, one host window):

  phase 1  run each of the N probe queries SOLO, sequentially; record
           per-query wall time and their sum (the serial baseline).
  phase 2  submit all N queries at once from N Python threads against
           ONE SparkSession (``.count()`` releases the GIL during JVM
           execution, so submission is genuinely concurrent) and record
           the makespan.

Report: ``speedup = sum(solo) / makespan`` — how much of the serial cost
the scheduler reclaims by interleaving stages — plus per-query finish
times under contention (the fairness spread). ``--fair`` A/Bs
``spark.scheduler.mode=FAIR`` with one pool per thread against the
default FIFO.

Run:  python scripts/concurrency_probe.py [--n 8] [--fair] [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Mid-weight, mutually diverse probe set: joins/agg (TPC-H-ish), window,
# posting-list dedup, LSH/ANN, Arrow k-means, text HOFs — so concurrent
# stages compete across shuffle, sort, window, and Python-Arrow resources
# rather than hammering one operator family.
PROBE_QUERIES = (
    "late_lines_by_returnflag",
    "sole_late_suppliers",
    "priority_order_counts",
    "top_revenue_supplier_window",
    "char_trigram_profile",
    "near_dup_jaccard_topk",
    "embedding_ann_lsh_topk",
    "kmeans_embedding_clusters",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="number of concurrent queries")
    ap.add_argument("--fair", action="store_true", help="use FAIR scheduler, one pool per thread")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from webscrap_datapipeline_spark.plans import REGISTRY
    from webscrap_datapipeline_spark.session import get_spark

    extra = {"spark.scheduler.mode": "FAIR"} if args.fair else {}
    spark = get_spark(app_name="concurrency-probe", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    if not 1 <= args.n <= len(PROBE_QUERIES):
        # never silently clamp: two runs "--n 8" and "--n 16" would
        # otherwise produce identical 8-way measurements (round-6 review)
        ap.error(
            f"--n must be between 1 and {len(PROBE_QUERIES)} (the probe set "
            f"has {len(PROBE_QUERIES)} mutually diverse queries)"
        )
    names = list(PROBE_QUERIES)[: args.n]

    # discarded warm-up: JVM/codegen/first-scan costs (and page cache)
    for name in names:
        REGISTRY[name].fn(spark, args.sf).count()

    # best-of-2 solo baseline: this host shows bursty CPU steal (the
    # reason bench.py is best-of-2/3) — a single inflated solo sample
    # would overstate serial_sum and therefore the reported speedup
    solo = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            REGISTRY[name].fn(spark, args.sf).count()
            best = min(best, time.monotonic() - t0)
        solo[name] = round(best, 3)

    def run_one(name: str) -> tuple[str, float]:
        if args.fair:
            # one pool per tenant: FAIR shares cores across pools instead
            # of FIFO's stage-arrival order (local-property, thread-scoped)
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
        t0 = time.monotonic()
        REGISTRY[name].fn(spark, args.sf).count()
        return name, round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    with ThreadPoolExecutor(max_workers=len(names)) as pool:
        finished = dict(pool.map(run_one, names))
    makespan = round(time.monotonic() - t0, 3)

    serial_sum = round(sum(solo.values()), 3)
    out = {
        "mode": "FAIR" if args.fair else "FIFO",
        "n": len(names),
        "solo": solo,
        "serial_sum_sec": serial_sum,
        "concurrent_finish_sec": finished,
        "makespan_sec": makespan,
        "speedup": round(serial_sum / makespan, 2),
        "slowest_concurrent": max(finished.values()),
        "sf": args.sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
