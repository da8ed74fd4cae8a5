"""Bucketed-scratch ABAB probe for the connected-components loop
(round-8 VERDICT item 5).

Round 8's negative result: `localCheckpoint` does NOT preserve hash
partitioning on Spark 4.1.2, so the CC loop's per-round join against
the symmetrized edge list cannot be co-located with checkpoints alone —
a bucketed scratch table is the only cross-job co-location tool. This
probe measures whether routing the mining chain's pair intermediate
through `operators/bucketing.write_bucketed` actually wins at ×64:

  mode=checkpoint   shipped path (eager localCheckpoint of sym edges)
  mode=bucketed     sym edges written once as a parquet table bucketed
                    (+sorted) on `u`, read back through the catalog so
                    every loop round's join reads pre-distributed
                    buckets (no edge-side Exchange)

The pair set is mined ONCE per process from the corpus (the flagship
chain's own jaccard threshold pairs) and frozen to plain parquet, so
both modes consume byte-identical input and the timing isolates the CC
loop + scratch I/O. At the default broadcast threshold the label table
broadcasts (round-8 plan audit: CC is ~2 s of 19 s at ×64) and there is
no edge-side Exchange to elide — ``--force-shuffle`` disables
auto-broadcast to probe the regime bucketing targets (labels outgrow
the broadcast threshold at cluster scale). Run ABAB (alternate modes
within one quiet window, fresh process each run; the session JVM is
not reusable across cells — SCALE.md measurement rules).

  python scripts/bucketed_cc_probe.py --mode checkpoint --force-shuffle
  python scripts/bucketed_cc_probe.py --mode bucketed  --force-shuffle

Prints ONE metrics JSON line on stdout (pair-prep info on stderr).
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/scaled_parity/x64")
    ap.add_argument("--mode", choices=("checkpoint", "bucketed"), required=True)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument(
        "--force-shuffle",
        action="store_true",
        help="set autoBroadcastJoinThreshold=-1: probe the regime where "
        "labels no longer broadcast and edge-side Exchange elision can "
        "matter (the cluster-scale contingency)",
    )
    ap.add_argument(
        "--pairs-parquet",
        default="",
        help="reuse a previously frozen pair set instead of re-mining "
        "(pass the same path to both ABAB cells for byte-identical input)",
    )
    args = ap.parse_args()

    from webscrap_datapipeline_spark.catalog import load_table
    from webscrap_datapipeline_spark.operators import dedup as DD
    from webscrap_datapipeline_spark.operators.bucketing import (
        bucketed,
        write_bucketed,
    )
    from webscrap_datapipeline_spark.operators.components import (
        connected_components,
    )
    from webscrap_datapipeline_spark.plans.text_queries import _SHINGLE_CAP
    from webscrap_datapipeline_spark.session import get_spark

    extra = {}
    if args.force_shuffle:
        extra["spark.sql.autoBroadcastJoinThreshold"] = "-1"
    spark = get_spark(app_name=f"bucketed-cc-probe-{args.mode}", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    scratch = tempfile.mkdtemp(prefix="cc_probe_")
    pairs_path = args.pairs_parquet or os.path.join(scratch, "pairs.parquet")
    if not os.path.isdir(pairs_path):
        t0 = time.monotonic()
        docs = load_table(spark, "documents", args.corpus)
        edges = DD.jaccard_pairs(
            docs, "text", "doc_id", n=3, max_shingle_freq=_SHINGLE_CAP
        ).filter(F.col("jaccard") >= 0.5)
        edges.select("doc_a", "doc_b").write.mode("overwrite").parquet(pairs_path)
        print(
            json.dumps({"pairs_mined_sec": round(time.monotonic() - t0, 1)}),
            file=sys.stderr,
            flush=True,
        )
    pairs = spark.read.parquet(pairs_path)
    n_pairs = pairs.count()

    if args.mode == "bucketed":
        table = "cc_probe_sym_scratch"
        sym_path = os.path.join(scratch, "sym_bucketed")

        def materialize(sym_df):
            write_bucketed(sym_df, table, ["u"], args.buckets, sym_path)
            return bucketed(spark, table)

    else:
        materialize = None

    # count edge-side Exchanges in the per-round join the loop runs:
    # build the representative plan the same way the loop does
    t0 = time.monotonic()
    comp = connected_components(pairs, "doc_a", "doc_b", sym_materializer=materialize)
    n_comp = comp.groupBy("component").count().count()
    wall = time.monotonic() - t0

    # representative per-round join plan, built EXACTLY the way the
    # loop builds it (symmetrized union first — round-9 review: probing
    # a one-direction frame measures a different-volume plan), counting
    # only SHUFFLE exchanges ("Exchange hashpartitioning"): a bare
    # "Exchange" substring count would also match BroadcastExchange,
    # which bucketing neither targets nor elides
    sym_dirs = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")).unionByName(
        pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    sym_probe = (
        bucketed(spark, "cc_probe_sym_scratch")
        if args.mode == "bucketed"
        else sym_dirs.localCheckpoint(eager=True)
    )
    labels_probe = sym_probe.select(F.col("u").alias("vertex")).distinct().withColumn(
        "component", F.col("vertex")
    )
    round_join = (
        sym_probe.join(labels_probe, sym_probe["u"] == labels_probe["vertex"])
        .groupBy(F.col("v").alias("vertex2"))
        .agg(F.min("component").alias("nbr_component"))
    )
    plan = round_join._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    n_broadcast_exchanges = plan.count("BroadcastExchange")

    spark.stop()
    # the mkdtemp scratch root is ALWAYS ours to remove — with
    # --pairs-parquet the pairs live elsewhere and the root holds only
    # sym_bucketed, which used to leak one /tmp/cc_probe_* per cell
    # (round-9 review)
    shutil.rmtree(scratch, ignore_errors=True)

    print(
        json.dumps(
            {
                "mode": args.mode,
                "force_shuffle": bool(args.force_shuffle),
                "buckets": args.buckets if args.mode == "bucketed" else None,
                "corpus": args.corpus,
                "n_pairs": n_pairs,
                "n_components": n_comp,
                "cc_wall_sec": round(wall, 2),
                "round_join_shuffle_exchanges": n_exchanges,
                "round_join_broadcast_exchanges": n_broadcast_exchanges,
            }
        )
    )


if __name__ == "__main__":
    main()
