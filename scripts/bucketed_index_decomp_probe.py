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
                "corpus_docs": args.corpus_docs,
                "batch_docs": args.batch_docs,
                "index_buckets": args.index_buckets,
                "mine_plain_s": mine_plain_s,
                "mine_bucketed_s": mine_bkt_s,
                "append_plain_s": append_plain_s,
                "append_bucketed_s": append_bkt_s,
                "read_path_delta_s": round(mine_bkt_s - mine_plain_s, 2),
                "write_path_delta_s": round(append_bkt_s - append_plain_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
