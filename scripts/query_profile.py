"""Per-query optimization profiler (round 12): for each named registry
query, report wall seconds (best of N), the number of Spark jobs the
query ran (actions inside fn() + the final count), and optionally dump
``explain("formatted")`` to a file — the measurement loop of
/opt/skills/guides/spark_optimization_guide.md §1 applied to this
engine's bench methodology.

Run: python scripts/query_profile.py --queries a,b,c [--explain-dir plans/r12]
     python scripts/query_profile.py --slowest 25   # from bench_full.json
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--slowest", type=int, default=0)
    ap.add_argument("--explain-dir", default="")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    names: list[str] = [n for n in args.queries.split(",") if n]
    if args.slowest:
        with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench_full.json")) as f:
            bench = json.load(f)["queries"]
        names += [
            n for n, _ in sorted(bench.items(), key=lambda kv: -kv[1])[: args.slowest]
            if n not in names
        ]
    spark = get_spark(app_name="query-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    tracker = spark.sparkContext.statusTracker()

    jvm_tracker = spark.sparkContext._jsc.statusTracker()

    def tasks_of(jids) -> int:
        total = 0
        for j in jids:
            ji = jvm_tracker.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds():
                si = jvm_tracker.getStageInfo(s)
                if si is not None:
                    total += si.numTasks()
        return total

    best: dict[str, float] = {n: 1e9 for n in names}
    # Interleaved passes (A,B,C,A,B,C,...) rather than per-query repeats:
    # the first pass absorbs codegen/JIT warm-up for everyone, and host
    # CPU-steal bursts hit different queries in different passes, so the
    # per-query min is comparable across profiler invocations.
    for _ in range(args.runs):
        for name in names:
            q = REGISTRY[name]
            t0 = time.perf_counter()
            spark.sparkContext.setJobGroup(name, name)
            df = q.fn(spark, args.sf)
            df.count()
            dt = time.perf_counter() - t0
            spark.sparkContext.setJobGroup(None, None)
            best[name] = min(best[name], dt)

    out = {}
    for name in names:
        q = REGISTRY[name]
        jids = tracker.getJobIdsForGroup(name)
        jobs = len(jids) // args.runs
        ntasks = tasks_of(jids) // args.runs
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = q.fn(spark, args.sf)
            with open(os.path.join(args.explain_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted"))
        out[name] = {"sec": round(best[name], 3), "jobs_per_run": jobs, "tasks_per_run": ntasks}
        print(f"{best[name]:7.3f}s  jobs/run={jobs:3d}  tasks/run={ntasks:5d}  {name}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
