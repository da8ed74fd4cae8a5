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
    scale_derive.count_volume). The cache is trusted only when BOTH its
    own _SUCCESS marker and a provenance stamp matching the corpus are
    present: the stamp records the corpus path and the corpus
    sentinel's payload, so a rebuilt corpus (e.g. a BUILD_REV bump) or
    a --corpora retarget invalidates the cache instead of silently
    measuring the OLD corpus's signatures — the exact mixing hazard
    the rev-stamped sentinels exist to prevent (round-7 review)."""
    from webscrap_datapipeline_spark.operators.dedup import simhash

    sentinel_path = os.path.join(corpus, "_CORPUS_COMPLETE")
    if not os.path.isfile(sentinel_path):
        raise SystemExit(
            f"{corpus} has no _CORPUS_COMPLETE sentinel — refusing to measure "
            "band volumes on a possibly-truncated corpus."
        )
    with open(sentinel_path) as fh:
        provenance = {"corpus": os.path.abspath(corpus), "sentinel": fh.read().strip()}
    path = os.path.join(cache_dir, f"{tag}_sigs.parquet")
    stamp_path = os.path.join(cache_dir, f"{tag}_sigs.provenance.json")
    cached = None
    if os.path.isfile(stamp_path):
        try:
            with open(stamp_path) as fh:
                cached = json.load(fh)
        except ValueError:
            cached = None
    if not (os.path.isfile(os.path.join(path, "_SUCCESS")) and cached == provenance):
        docs = spark.read.parquet(os.path.join(corpus, "documents.parquet"))
        simhash(docs, "text", "doc_id").write.mode("overwrite").parquet(path)
        with open(stamp_path, "w") as fh:
            json.dump(provenance, fh)
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

        # the single-band baseline at THIS tolerance (bands = tol+1 is
        # the pigeonhole minimum, width = what 63 bits afford) — at the
        # default tol=8 this is exactly the shipped query's 9×7 scheme;
        # deriving it from the flag keeps the two printed rows
        # commensurable at any tolerance (round-7 review)
        base_bands = args.hamming_tol + 1
        base_width = 63 // base_bands
        base = volume_stats(
            simhash_bit_band_keys(sh, bands=base_bands, width=base_width),
            "band_idx",
            "band_val",
        )
        print(
            json.dumps(
                {
                    "factor": factor,
                    "docs": n,
                    "scheme": f"single-band {base_bands}x{base_width}",
                    **base,
                }
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
