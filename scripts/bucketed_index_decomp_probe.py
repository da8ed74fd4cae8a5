"""Decompose the bucketed-vs-plain streaming-index trade (round-10).

The bucketed (band, bucket) catalog layout removes the CORPUS-side
shuffle from every per-batch mine (read path) but adds a hash-into-
buckets shuffle + sort to every per-batch index APPEND (write path).
Which term wins depends on the corpus:batch ratio — the saved term
grows with the CORPUS, the paid term with the BATCH. This probe times
the two terms separately on a static setup (no streaming machinery, 3
repeats, min wins), so the live-wire cells in SCALE.md can be read as
the sum of measured parts rather than a mystery.

Run:
  python scripts/bucketed_index_decomp_probe.py --corpus-docs 384000 --batch-docs 60000

``--replicate K`` builds the corpus index by replication (round-10
VERDICT item 3: measure PAST the derived ~25x break-even, which is
unreachable by honest minhashing in a local window): the bootstrap
index is unioned K times with per-copy doc prefixes and per-copy
REHASHED buckets (md5(bucket || copy)), so each copy keeps the
original posting-list structure without cross-copy collisions — the
batch's join output stays batch-realistic while the corpus side the
join must move/scan grows K-fold, which is exactly the term under
measurement.

Prints ONE metrics JSON line on stdout.
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
    ap.add_argument("--corpus-docs", type=int, default=384_000)
    ap.add_argument("--batch-docs", type=int, default=60_000)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--index-buckets", type=int, default=32)
    ap.add_argument("--replicate", type=int, default=1)
    args = ap.parse_args()

    from webscrap_datapipeline_spark.operators.dedup import (
        incremental_lsh_candidates_from_index,
        lsh_band_index,
        minhash_signatures,
    )
    from webscrap_datapipeline_spark.session import get_spark
    from webscrap_datapipeline_spark.streaming.dedup_stream import (
        _write_index_partition,
        bootstrap_lsh_index,
    )

    spark = get_spark(app_name="bucketed-index-decomp-probe")
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="bkt_decomp_")
    plain_dir = os.path.join(workdir, "plain_idx")
    bkt_dir = os.path.join(workdir, "bkt_idx")
    table = "decomp_probe_lsh_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")

    corpus = spark.range(args.corpus_docs).select(
        F.concat(F.lit("c"), F.col("id")).alias("doc_id"),
        synth_text(F.col("id")).alias("text"),
    )
    bootstrap_lsh_index(corpus, plain_dir)
    if args.replicate > 1:
        # eager checkpoint: the big index is written back INTO plain_dir,
        # so the base must be materialized before the dir is removed
        base_idx = (
            spark.read.parquet(plain_dir)
            .select("doc", "band", "bucket")
            .localCheckpoint(eager=True)
        )
        from scripts.streaming_dedup_probe import replicate_band_index

        big_idx = replicate_band_index(base_idx, args.replicate)
        shutil.rmtree(plain_dir, ignore_errors=True)
        _write_index_partition(big_idx, -1, plain_dir, None, args.index_buckets)
        from webscrap_datapipeline_spark.streaming.dedup_stream import (
            register_lsh_index_table,
        )

        register_lsh_index_table(
            spark, table, bkt_dir, num_buckets=args.index_buckets
        )
        _write_index_partition(big_idx, -1, bkt_dir, table, args.index_buckets)
    else:
        bootstrap_lsh_index(
            corpus, bkt_dir, index_table=table, index_buckets=args.index_buckets
        )

    # the batch: every 10th doc dups a corpus doc, others unique
    seed = F.when(
        F.col("id") % 10 == 0, F.floor(F.col("id") / 10)
    ).otherwise(F.col("id") + 10**12)
    batch = spark.range(args.batch_docs).select(
        F.concat(F.lit("n"), F.col("id")).alias("doc_id"),
        synth_text(seed).alias("text"),
    )
    new_idx = lsh_band_index(minhash_signatures(batch, "text", "doc_id")).localCheckpoint(
        eager=True
    )

    def best(fn) -> float:
        t = float("inf")
        for _ in range(args.repeats):
            t0 = time.monotonic()
            fn()
            t = min(t, time.monotonic() - t0)
        return round(t, 2)

    # READ PATH: per-batch mine (join + posting lists + distinct), no write
    plain_corpus = spark.read.parquet(plain_dir).filter(F.col("__batch_id") < 10**9)
    bkt_corpus = spark.table(table).filter(F.col("__batch_id") < 10**9)
    mine_plain_s = best(
        lambda: incremental_lsh_candidates_from_index(plain_corpus, new_idx).count()
    )
    mine_bkt_s = best(
        lambda: incremental_lsh_candidates_from_index(bkt_corpus, new_idx).count()
    )

    # plan self-description: which regime this cell measured (round-11 —
    # a broadcastable batch joins as BHJ with NO corpus Exchange in
    # EITHER layout; only above-envelope batches show the 4-vs-3
    # Exchange elision the bucketed layout exists for)
    def join_shape(corpus):
        df = incremental_lsh_candidates_from_index(corpus, new_idx)
        # execute through the DataFrame's OWN QueryExecution first:
        # under AQE the un-executed plan is the INITIAL one (a
        # statically-unsized localCheckpoint batch side plans as SMJ
        # and only becomes a broadcast join at runtime), so reading it
        # un-run would misreport the regime this cell measured
        # (round-11 review). toRdd() shares the QE, and its JVM-side
        # count never moves rows to the driver.
        df._jdf.queryExecution().toRdd().count()
        p = df._jdf.queryExecution().executedPlan().toString()
        p = p.split("== Initial Plan ==")[0]
        kind = (
            "broadcast"
            if "BroadcastHashJoin" in p
            else ("smj" if "SortMergeJoin" in p else "other")
        )
        return kind, p.count("Exchange hashpartitioning")

    plain_join, plain_ex = join_shape(plain_corpus)
    bkt_join, bkt_ex = join_shape(bkt_corpus)

    # WRITE PATH: per-batch index append (distinct batch ids per repeat,
    # then removed, so each repeat appends the same volume fresh)
    def append_plain():
        _write_index_partition(new_idx, 500, plain_dir, None, args.index_buckets)
        shutil.rmtree(os.path.join(plain_dir, "__batch_id=500"), ignore_errors=True)

    def append_bkt():
        _write_index_partition(new_idx, 500, bkt_dir, table, args.index_buckets)
        spark.sql(f"ALTER TABLE {table} DROP IF EXISTS PARTITION (__batch_id=500)")
        shutil.rmtree(os.path.join(bkt_dir, "__batch_id=500"), ignore_errors=True)

    append_plain_s = best(append_plain)
    append_bkt_s = best(append_bkt)

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "bucketed_index_decomposition",
                "corpus_docs": args.corpus_docs * args.replicate,
                "replicate": args.replicate,
                "batch_docs": args.batch_docs,
                "index_buckets": args.index_buckets,
                "mine_plain_s": mine_plain_s,
                "mine_bucketed_s": mine_bkt_s,
                "join_plain": plain_join,
                "join_bucketed": bkt_join,
                "exchanges_plain": plain_ex,
                "exchanges_bucketed": bkt_ex,
                "append_plain_s": append_plain_s,
                "append_bucketed_s": append_bkt_s,
                "read_path_delta_s": round(mine_bkt_s - mine_plain_s, 2),
                "write_path_delta_s": round(append_bkt_s - append_plain_s, 2),
                "per_batch_plain_s": round(mine_plain_s + append_plain_s, 2),
                "per_batch_bucketed_s": round(mine_bkt_s + append_bkt_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
