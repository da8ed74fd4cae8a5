"""Streaming ANN index probe: per-batch ingest cost and serve-path
latency of `streaming/ann_stream.py` vs CORPUS SIZE.

Two claims under measurement (module docstring's scale posture):

  1. INGEST is corpus-oblivious. The sink bucketes the micro-batch
     map-side and appends one partition — it never reads the index —
     so per-batch cost must be FLAT across any bootstrap corpus size
     (contrast the dedup sink, whose mine join reads the corpus every
     trigger). Run the same rate at two --corpus-vecs to verify.
  2. SERVE cost is one corpus scan + a broadcast join. Query latency
     grows linearly with index rows (the scan), and the multiprobe=1
     knob pays only candidate volume, not corpus volume. The probe
     times both probe settings against the live index, plus the
     small-files effect: serve latency with one-partition-per-batch
     vs after a maximal fold (compact_ann_index).

Vectors are synthesized JVM-side (xxhash64-derived floats — no Python
in the row path, injective in the seed). Every query IS a corpus
vector (seed < corpus), so each query has a planted exact self-match;
``self_recall`` = fraction of queries whose own vector surfaces at
rank 1 with score ≈ 1 — a recall floor that needs no brute-force
pass at probe volumes.

Run (the corpus-independence pair — same rate, 16× the corpus):
  python scripts/ann_stream_probe.py --rate 50000 --corpus-vecs 100000
  python scripts/ann_stream_probe.py --rate 50000 --corpus-vecs 1600000

Prints ONE metrics JSON line on stdout (scheme info to stderr).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def synth_vec(seed_col, dim: int):
    """Deterministic pseudo-random embedding in [-1, 1]^dim from a
    seed column — xxhash64 per dimension, pure JVM column math."""
    return F.array(
        *[
            (
                F.pmod(F.xxhash64(seed_col, F.lit(i)), F.lit(2001)) / 1000.0 - 1.0
            ).cast("float")
            for i in range(dim)
        ]
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rate", type=int, default=50_000, help="offered vectors/sec")
    ap.add_argument("--seconds", type=int, default=120, help="measurement window")
    ap.add_argument("--trigger-seconds", type=int, default=10)
    ap.add_argument(
        "--corpus-vecs",
        type=int,
        default=100_000,
        help="bootstrap index size — run the SAME rate at two sizes to "
        "measure the ingest corpus-independence claim",
    )
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument(
        "--n-planes",
        type=int,
        default=0,
        help="hyperplane count; 0 = auto_planes(corpus_vecs) — the "
        "log2-scaled production default",
    )
    ap.add_argument("--queries", type=int, default=64, help="serve-path query count")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument(
        "--compact-every",
        type=int,
        default=0,
        help="fold the index inside the sink every N batches (0 = never)",
    )
    ap.add_argument(
        "--compact-max-partitions",
        type=int,
        default=0,
        help="tiered in-sink fold width (0 = full fold)",
    )
    ap.add_argument(
        "--retain-batches",
        type=int,
        default=0,
        help="keep only the last N batches' vectors (0 = keep forever)",
    )
    ap.add_argument(
        "--serve-during-ingest",
        type=int,
        default=0,
        help="run a serve query through committed_serve_cut every N "
        "seconds WHILE the stream ingests (0 = serve only after the "
        "window) — measures the concurrent-serve contention a "
        "production deployment actually pays on shared executors, and "
        "exercises the lock-free committed-prefix read path on a live "
        "wire",
    )
    ap.add_argument("--workdir", default="")
    args = ap.parse_args()

    from webscrap_datapipeline_spark.operators.similarity import auto_planes
    from webscrap_datapipeline_spark.session import get_spark
    from webscrap_datapipeline_spark.streaming.ann_stream import (
        ann_query_index,
        bootstrap_ann_index,
        committed_serve_cut,
        compact_ann_index,
        incremental_ann_sink,
        read_ann_index,
    )

    n_planes = args.n_planes or auto_planes(args.corpus_vecs)
    spark = get_spark(
        app_name="ann-stream-probe",
        # recentProgress is a ~100-entry ring buffer: a long window
        # (outage + drain + steady batches) silently evicts the peak
        # batches and the reconstructed backlog curve re-zeros mid-run
        # (round-11 review). Size it past any plausible probe window.
        extra_conf={"spark.sql.streaming.numRecentProgressUpdates": "10000"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    workdir = args.workdir or tempfile.mkdtemp(prefix="ann_stream_probe_")
    index_dir = os.path.join(workdir, "ann_index")
    ckpt = os.path.join(workdir, "ckpt")

    t0 = time.monotonic()
    corpus = spark.range(args.corpus_vecs).select(
        F.col("id").alias("vec_id"), synth_vec(F.col("id"), args.dim).alias("embedding")
    )
    n_boot = bootstrap_ann_index(
        corpus, index_dir, dim=args.dim, n_planes=n_planes
    )
    print(
        json.dumps(
            {
                "bootstrap_vecs": n_boot,
                "n_planes": n_planes,
                "bootstrap_sec": round(time.monotonic() - t0, 1),
            }
        ),
        file=sys.stderr,
        flush=True,
    )

    # streamed ids sit far above the corpus range: unique new vectors
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(args.rate))
        .load()
        .select(
            (F.col("value") + F.lit(10**12)).alias("vec_id"),
            synth_vec(F.col("value") + F.lit(10**12), args.dim).alias("embedding"),
        )
    )
    sink = incremental_ann_sink(
        index_dir,
        dim=args.dim,
        n_planes=n_planes,
        compact_every=args.compact_every or None,
        compact_max_partitions=args.compact_max_partitions or None,
        retain_batches=args.retain_batches or None,
    )
    # serve queries built up front: every query is a corpus vector
    # (planted exact self-match), reused for the in-window and
    # post-window serve cells
    queries = spark.range(args.queries).select(
        F.col("id").alias("query_id"), synth_vec(F.col("id"), args.dim).alias("query_vec")
    ).localCheckpoint(eager=True)

    ws = src.writeStream.foreachBatch(sink).option("checkpointLocation", ckpt)
    if args.trigger_seconds:
        ws = ws.trigger(processingTime=f"{args.trigger_seconds} seconds")
    q = ws.start()
    live_serves = []
    try:
        t_end = time.monotonic() + args.seconds
        while time.monotonic() < t_end:
            if not args.serve_during_ingest:
                time.sleep(min(1.0, max(0.0, t_end - time.monotonic())))
                continue
            time.sleep(
                min(args.serve_during_ingest, max(0.0, t_end - time.monotonic()))
            )
            if time.monotonic() >= t_end:
                break
            # lock-free committed-prefix serve on the LIVE wire: reads
            # race nothing (committed partitions immutable, in-flight
            # pruned); latency includes scheduler contention with the
            # concurrently-running micro-batch — the honest number
            cut = committed_serve_cut(spark, ckpt)
            ts = time.monotonic()
            n = ann_query_index(
                spark, index_dir, queries, k=args.k, multiprobe=1,
                upto_batch_id=cut,
            ).count()
            live_serves.append(
                {
                    "at_s": round(time.monotonic() - (t_end - args.seconds), 1),
                    "cut": cut,
                    "serve_sec": round(time.monotonic() - ts, 2),
                    "rows": n,
                }
            )
        exc = q.exception()
        if exc is not None or not q.isActive:
            raise SystemExit(
                f"streaming query died {q.isActive=} before the window "
                f"closed — no throughput claim can be made: {exc}"
            )
        progress = [json.loads(p.json) for p in q.recentProgress]
    finally:
        # stop BETWEEN triggers when possible: stopping mid-batch makes
        # Spark's StreamExecution.isInterruptionException regex-scan the
        # interrupted py4j exception message, whose embedded plan string
        # (64 synth-vec expressions) is big enough to blow the regex
        # engine's stack (java.util.regex recursion ∝ input length) —
        # an uncaught cosmetic StackOverflowError in the stream thread
        # AFTER all commits. Shrinking the stop window avoids the noise;
        # correctness never depended on it.
        deadline = time.monotonic() + 15
        while time.monotonic() < deadline and q.status.get("isTriggerActive"):
            time.sleep(0.2)
        q.stop()

    n_index = read_ann_index(spark, index_dir).count()
    parts_end = len(
        [d for d in os.listdir(index_dir) if d.startswith("__batch_id=")]
    )

    # serve-path cells: timed twice, best-of (first run pays scan
    # warmup)
    def serve_cell(multiprobe: int) -> dict:
        best, hits = None, 0
        for _ in range(2):
            t = time.monotonic()
            rows = ann_query_index(
                spark, index_dir, queries, k=args.k, multiprobe=multiprobe
            ).collect()
            dt = time.monotonic() - t
            best = dt if best is None else min(best, dt)
            hits = sum(
                1
                for r in rows
                if r["rnk"] == 1
                and r["vec_id"] == r["query_id"]
                and r["score"] > 0.999999
            )
        return {
            "serve_sec": round(best, 2),
            "self_recall": round(hits / args.queries, 3),
        }

    cells = {"mp0": serve_cell(0), "mp1": serve_cell(1)}

    # small-files reclaim: maximal fold, then re-time the mp1 cell
    post_compact = None
    if parts_end > 2:
        last_batch = max(
            int(d.split("=", 1)[1])
            for d in os.listdir(index_dir)
            if d.startswith("__batch_id=")
        )
        fold = compact_ann_index(spark, index_dir, upto_batch_id=last_batch)
        post_compact = {
            "folded_partitions": fold["folded_partitions"],
            "partitions_after": len(
                [d for d in os.listdir(index_dir) if d.startswith("__batch_id=")]
            ),
            "mp1": serve_cell(1),
        }

    spark.stop()
    if not args.workdir:
        shutil.rmtree(workdir, ignore_errors=True)

    usable = [p for p in progress[max(1, len(progress) // 3):] if p.get("numInputRows")]
    if not usable:
        print(json.dumps({"error": "no post-warmup batches with input rows"}))
        return
    proc = [p["processedRowsPerSecond"] for p in usable]
    inp = [p["inputRowsPerSecond"] for p in usable]
    durs = [p["batchDuration"] for p in usable]
    processed = round(statistics.mean(proc), 1)
    offered = round(statistics.mean(inp), 1)
    out = {
        "offered_rate": args.rate,
        "corpus_vecs": args.corpus_vecs,
        "dim": args.dim,
        "n_planes": n_planes,
        "trigger_seconds": args.trigger_seconds,
        "compact_every": args.compact_every,
        "compact_max_partitions": args.compact_max_partitions,
        "retain_batches": args.retain_batches,
        "batches_measured": len(usable),
        "input_rows_per_sec": offered,
        "processed_rows_per_sec": processed,
        "keeping_up": processed >= 0.95 * offered,
        "batch_ms_p50": round(statistics.median(durs), 1),
        "batch_ms_max": max(durs),
        "index_rows_end": n_index,
        "index_partitions_end": parts_end,
        "queries": args.queries,
        "k": args.k,
        "serve": cells,
    }
    if live_serves:
        out["serve_during_ingest"] = live_serves
    if post_compact:
        out["post_compact"] = post_compact
    print(json.dumps(out))


if __name__ == "__main__":
    main()
