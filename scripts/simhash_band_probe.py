"""SimHash bit-band candidate-volume probe (round-6 VERDICT task 3).

Hyperplane LSH's fixed-plane quadratic was measured and fixed in round
6 (``auto_planes``); SimHash bit-banding carries the same asymptotic —
a 7-bit band value has only 128 buckets, so per-band occupancy is
n/128 and within-bucket candidate pairs grow as n²/2⁷ — but the term
was documented, not measured. This probe measures it the GC-immune way
(exact one-scan bucket histograms: Σ c·(c−1)/2 — volumes, not
timings), on the same replicated corpora as the round-6 curves, for:

  * the shipped 9-band × 7-bit scheme
    (``operators/dedup.simhash_bit_band_keys`` — IMPORTED, so the
    measured banding is exactly the shipped query's), and
  * the mitigation, k-of-bands composite keys
    (``simhash_multi_band_keys``) at the corpus-sized k chosen by
    ``simhash_auto_band_scheme`` — pigeonhole recall preserved, bucket
    space multiplied by 2**(width·(k−1)).

Signatures are computed once per corpus (the wide one-pass
``dedup.simhash``) and cached as parquet next to the corpus — the
histograms are then cheap scans over |docs| rows.

Run:  python scripts/simhash_band_probe.py \
          [--corpora /tmp/scale_spot] [--factors 64,256,1024] \
          [--sig-cache /tmp/simhash_probe]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402


def volume_stats(keys: DataFrame, idx_col: str, val_col: str) -> dict:
    """Exact candidate-pair volume over an LSH key frame: bucket
    histogram → Σ c·(c−1)/2, max occupancy, bucket count."""
    hist = keys.groupBy(idx_col, val_col).agg(F.count(F.lit(1)).alias("c"))
    row = hist.agg(
        F.expr("sum(c * (c - 1)) div 2").cast("bigint").alias("pairs"),
        F.max("c").alias("max_occupancy"),
        F.count(F.lit(1)).alias("n_buckets"),
    ).collect()[0]
    return {
        "candidate_pairs": row["pairs"],
        "max_occupancy": row["max_occupancy"],
        "n_buckets": row["n_buckets"],
    }


def signatures_for(spark: SparkSession, corpus: str, cache_dir: str, tag: str) -> DataFrame:
    """Cached (doc, simhash) signatures for a corpus' documents table.
    Refuses a corpus without its completeness sentinel (a truncated
    build would poison the volume table — same rule as
    scale_derive.count_volume); the cache is trusted only with its own
    _SUCCESS marker."""
    from webscrap_datapipeline_spark.operators.dedup import simhash

    if not os.path.isfile(os.path.join(corpus, "_CORPUS_COMPLETE")):
        raise SystemExit(
            f"{corpus} has no _CORPUS_COMPLETE sentinel — refusing to measure "
            "band volumes on a possibly-truncated corpus."
        )
    path = os.path.join(cache_dir, f"{tag}_sigs.parquet")
    if not os.path.isfile(os.path.join(path, "_SUCCESS")):
        docs = spark.read.parquet(os.path.join(corpus, "documents.parquet"))
        simhash(docs, "text", "doc_id").write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpora", default="/tmp/scale_spot")
    ap.add_argument("--factors", default="64,256,1024")
    ap.add_argument("--sig-cache", default="/tmp/simhash_probe")
    ap.add_argument("--hamming-tol", type=int, default=8)
    args = ap.parse_args()

    from webscrap_datapipeline_spark.operators.dedup import (
        simhash_auto_band_scheme,
        simhash_bit_band_keys,
        simhash_multi_band_keys,
    )
    from webscrap_datapipeline_spark.session import get_spark

    os.makedirs(args.sig_cache, exist_ok=True)
    spark = get_spark(app_name="simhash-band-probe")
    spark.sparkContext.setLogLevel("ERROR")

    for factor in (int(x) for x in args.factors.split(",")):
        tag = f"x{factor}"
        corpus = os.path.join(args.corpora, tag)
        sh = signatures_for(spark, corpus, args.sig_cache, tag).localCheckpoint(eager=False)
        n = sh.count()

        base = volume_stats(
            simhash_bit_band_keys(sh, bands=9, width=7), "band_idx", "band_val"
        )
        print(
            json.dumps(
                {"factor": factor, "docs": n, "scheme": "single-band 9x7", **base}
            ),
            flush=True,
        )

        k, bands, width = simhash_auto_band_scheme(n, hamming_tol=args.hamming_tol)
        if k > 1:
            multi = volume_stats(
                simhash_multi_band_keys(sh, args.hamming_tol, k=k), "key_idx", "key_val"
            )
            print(
                json.dumps(
                    {
                        "factor": factor,
                        "docs": n,
                        "scheme": f"auto k={k} ({bands} bands x {width} bits)",
                        **multi,
                    }
                ),
                flush=True,
            )
        else:
            print(
                json.dumps(
                    {"factor": factor, "docs": n, "scheme": "auto k=1 (same as single-band)"}
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
