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


# The adversarial-mix light tenants: sub-second, scan+agg/window shaped —
# the "interactive dashboard" class a monster batch query starves first.
LIGHT_QUERIES = (
    "priority_order_counts",
    "top_revenue_supplier_window",
    "late_lines_by_returnflag",
    "embedding_ann_lsh_topk",
)


def _adversarial(
    spark, REGISTRY, sf: str, heavy_name: str, fair: bool, heavy_sf: str | None = None
) -> dict:
    """One heavy tenant vs four light tenants: start ``heavy_name`` in a
    thread, then loop the light set sequentially until the heavy query
    finishes; report each light query's median latency under contention
    vs its best-of-2 solo baseline. This measures what FAIR actually
    protects — small-tenant latency under a monster query — instead of
    asserting it."""
    import statistics
    import threading

    heavy_sf = heavy_sf or sf
    for name in LIGHT_QUERIES:  # warm-up, discarded
        REGISTRY[name].fn(spark, sf).count()
    solo = {}
    for name in LIGHT_QUERIES:
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            REGISTRY[name].fn(spark, sf).count()
            best = min(best, time.monotonic() - t0)
        solo[name] = round(best, 3)

    heavy_done = threading.Event()
    heavy_sec = [0.0]
    heavy_err: list[BaseException] = []

    def run_heavy():
        # finally-set: an exception here (bad query name, missing
        # corpus) must not leave the light loop spinning forever
        # (round-6 review); the error is re-raised after join.
        try:
            if fair:
                spark.sparkContext.setLocalProperty("spark.scheduler.pool", "heavy")
            t0 = time.monotonic()
            REGISTRY[heavy_name].fn(spark, heavy_sf).count()
            heavy_sec[0] = round(time.monotonic() - t0, 3)
        except BaseException as e:  # noqa: BLE001 — re-raised below
            heavy_err.append(e)
        finally:
            heavy_done.set()

    th = threading.Thread(target=run_heavy)
    th.start()
    lat: dict[str, list[float]] = {n: [] for n in LIGHT_QUERIES}
    if fair:
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", "light")
    while not heavy_done.is_set():
        for name in LIGHT_QUERIES:
            t0 = time.monotonic()
            REGISTRY[name].fn(spark, sf).count()
            lat[name].append(time.monotonic() - t0)
            if heavy_done.is_set():
                break
    th.join()
    if heavy_err:
        raise SystemExit(
            f"adversarial heavy tenant {heavy_name!r} failed — no fairness "
            f"claim can be made: {heavy_err[0]!r}"
        )
    med = {n: round(statistics.median(v), 3) for n, v in lat.items() if v}
    return {
        "mode": "FAIR" if fair else "FIFO",
        "heavy": heavy_name,
        "heavy_sf": heavy_sf,
        "heavy_sec": heavy_sec[0],
        "light_solo": solo,
        "light_median_under_heavy": med,
        "light_slowdown": {
            n: round(med[n] / solo[n], 2) for n in med if solo.get(n, 0) > 0
        },
        "light_rounds_completed": min(len(v) for v in lat.values()) if lat else 0,
        "sf": sf,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="number of concurrent queries")
    ap.add_argument("--fair", action="store_true", help="use FAIR scheduler, one pool per thread")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument(
        "--adversarial",
        metavar="HEAVY_QUERY",
        default=None,
        help="adversarial mix instead of the uniform fan-out: run this heavy "
        "query as one tenant and measure the light set's latency under it",
    )
    ap.add_argument(
        "--heavy-sf",
        default=None,
        help="corpus for the adversarial heavy tenant (default: --sf). Point "
        "at a scaled corpus so the monster query outlives many light rounds",
    )
    args = ap.parse_args()

    from webscrap_datapipeline_spark.plans import REGISTRY
    from webscrap_datapipeline_spark.session import get_spark

    extra = {"spark.scheduler.mode": "FAIR"} if args.fair else {}
    spark = get_spark(app_name="concurrency-probe", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    if args.adversarial:
        out = _adversarial(
            spark, REGISTRY, args.sf, args.adversarial, args.fair, args.heavy_sf
        )
        print(json.dumps(out))
        spark.stop()
        return

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
