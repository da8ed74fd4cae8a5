"""Compaction probe: per-batch sink cost vs index PARTITION COUNT at a
fixed corpus size — the stream-age cost `compact_lsh_index` reclaims.

Builds the same corpus index twice: once fragmented into
``--partitions`` per-batch partitions (a stream that has run
``--partitions`` triggers), once compacted to a single consolidated
partition, and times the SAME micro-batch mine against each. Corpus
content identical, so any delta is pure layout: file listing +
parquet footer reads + per-file task setup.

Prints ONE metrics JSON line on stdout.

Run:
  python scripts/compaction_probe.py --corpus-docs 96000 --partitions 480
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from streaming_dedup_probe import synth_text  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus-docs", type=int, default=96_000)
    ap.add_argument("--partitions", type=int, default=480, help="simulated trigger count")
    ap.add_argument("--batch-docs", type=int, default=48_000)
    ap.add_argument("--dup-every", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=3, help="sink timings per layout (min wins)")
    ap.add_argument(
        "--tiered-k",
        type=int,
        default=0,
        help="also run a TIERED-fold arm (round-9 VERDICT item 6): "
        "replay the stream's fold cadence over the fragmented layout "
        "with max_fold_partitions=K, timing EVERY fold — the claim is "
        "bounded per-cadence fold latency (no whole-corpus rewrite in "
        "one trigger) while end-state batch cost still matches the "
        "fully compacted layout",
    )
    ap.add_argument(
        "--tiered-cadence",
        type=int,
        default=8,
        help="simulated compact_every for the tiered arm (a fold per "
        "this many accrued partitions)",
    )
    args = ap.parse_args()

    from webscrap_datapipeline_spark.operators.dedup import (
        lsh_band_index,
        minhash_signatures,
    )
    from webscrap_datapipeline_spark.session import get_spark
    from webscrap_datapipeline_spark.streaming.dedup_stream import (
        compact_lsh_index,
        incremental_near_dup_sink,
    )

    spark = get_spark(app_name="compaction-probe")
    spark.sparkContext.setLogLevel("ERROR")

    workdir = tempfile.mkdtemp(prefix="compaction_probe_")
    frag_dir = os.path.join(workdir, "idx_fragmented")
    comp_dir = os.path.join(workdir, "idx_compacted")

    # corpus index fragmented into one partition per simulated trigger
    corpus = spark.range(args.corpus_docs).select(
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("doc_id"),
        synth_text(F.col("id")).alias("text"),
    )
    sigs = minhash_signatures(corpus, "text", "doc_id")
    (
        lsh_band_index(sigs)
        .withColumn(
            "__batch_id",
            F.abs(F.xxhash64("doc")) % args.partitions,  # spread docs over triggers
        )
        .write.mode("overwrite")
        .partitionBy("__batch_id")
        .parquet(frag_dir)
    )
    shutil.copytree(frag_dir, comp_dir)
    tier_dir = os.path.join(workdir, "idx_tiered")
    if args.tiered_k:
        shutil.copytree(frag_dir, tier_dir)
    t_full = time.monotonic()
    comp_stats = compact_lsh_index(spark, comp_dir, upto_batch_id=args.partitions)
    full_fold_s = time.monotonic() - t_full

    tier_stats = None
    if args.tiered_k:
        # replay the stream's maintenance cadence over the aged layout:
        # one bounded fold per --tiered-cadence accrued partitions, as
        # the sink's compact_every + compact_max_partitions would run it
        fold_times = []
        for upto in range(args.tiered_cadence - 1, args.partitions + 1, args.tiered_cadence):
            t0 = time.monotonic()
            compact_lsh_index(
                spark,
                tier_dir,
                upto_batch_id=upto,
                max_fold_partitions=args.tiered_k,
            )
            fold_times.append(time.monotonic() - t0)
        # drain the backlog the short replay leaves (a real stream keeps
        # folding on cadence; the replay has a fixed horizon)
        while True:
            t0 = time.monotonic()
            st = compact_lsh_index(
                spark,
                tier_dir,
                upto_batch_id=args.partitions,
                max_fold_partitions=args.tiered_k,
            )
            if st["folded_partitions"] == 0 and "merged_chunks" not in st:
                break
            fold_times.append(time.monotonic() - t0)
        tier_stats = {
            "folds": len(fold_times),
            "fold_s_max": round(max(fold_times), 2),
            "fold_s_p50": round(sorted(fold_times)[len(fold_times) // 2], 2),
            "fold_s_total": round(sum(fold_times), 2),
            "partitions_end": len(
                [d for d in os.listdir(tier_dir) if d.startswith("__batch_id=")]
            ),
        }

    # the measured micro-batch: dup_every-th doc duplicates a corpus doc
    batch = spark.range(args.batch_docs).select(
        F.concat(F.lit("n"), F.col("id").cast("string")).alias("doc_id"),
        synth_text(
            F.when(
                F.col("id") % args.dup_every == 0,
                F.floor(F.col("id") / args.dup_every),
            ).otherwise(F.col("id") + 10_000_000)
        ).alias("text"),
    ).localCheckpoint(eager=True)  # batch build cost stays out of the timing

    def time_sink(index_dir: str) -> float:
        best = float("inf")
        for i in range(args.repeats):
            pairs_dir = os.path.join(workdir, f"pairs_{os.path.basename(index_dir)}_{i}")
            sink = incremental_near_dup_sink(index_dir, pairs_dir)
            t0 = time.monotonic()
            # batch id above every stored partition: mines the full corpus
            sink(batch, args.partitions + 1 + i)
            best = min(best, time.monotonic() - t0)
            # remove the appended batch partitions so every repeat sees
            # the same corpus layout
            for d in (index_dir,):
                p = os.path.join(d, f"__batch_id={args.partitions + 1 + i}")
                if os.path.isdir(p):
                    shutil.rmtree(p)
        return best

    frag_s = time_sink(frag_dir)
    comp_s = time_sink(comp_dir)
    out = {
        "metric": "compaction_probe",
        "corpus_docs": args.corpus_docs,
        "partitions_before": args.partitions,
        "folded_partitions": comp_stats["folded_partitions"],
        "batch_docs": args.batch_docs,
        "fragmented_batch_s": round(frag_s, 2),
        "compacted_batch_s": round(comp_s, 2),
        "speedup": round(frag_s / comp_s, 2) if comp_s else None,
        "full_fold_s": round(full_fold_s, 2),
    }
    if tier_stats is not None:
        tier_batch_s = time_sink(tier_dir)
        out.update(
            {
                "tiered_k": args.tiered_k,
                "tiered_cadence": args.tiered_cadence,
                **{f"tiered_{k}": v for k, v in tier_stats.items()},
                "tiered_batch_s": round(tier_batch_s, 2),
            }
        )
    print(json.dumps(out))
    shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
