"""Recall-vs-probe-budget comparison of the two streaming-ANN cell
geometries on REAL clustered embeddings (the testdata embeddings table
has 10 label clusters — the structure IVF exists for).

For each kind the corpus is indexed once (streaming/ann_stream
bootstrap, the exact serve path queries then run against), and
recall@k is computed against brute-force ground truth at matched
candidate budgets: a hyperplane index with 2**b ≈ n_cells buckets
probes ~the same number of candidates at multiprobe=0 as an IVF index
with n_cells cells at nprobe=1 — so differences are geometry quality,
not budget. Prints one JSON line.

Run: python scripts/ann_recall_probe.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--n-queries", type=int, default=100)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument(
        "--cells",
        type=int,
        default=16,
        help="IVF cell count; the hyperplane twin gets log2(cells) planes "
        "so single-probe candidate budgets match",
    )
    ap.add_argument("--kmeans-iters", type=int, default=3)
    args = ap.parse_args()
    n_planes = max(1, (args.cells - 1).bit_length())

    from webscrap_datapipeline_spark.operators.clustering import kmeans_fit
    from webscrap_datapipeline_spark.operators.similarity import brute_force_topk
    from webscrap_datapipeline_spark.session import get_spark
    from webscrap_datapipeline_spark.streaming.ann_stream import (
        ann_query_index,
        bootstrap_ann_index,
    )

    spark = get_spark(app_name="ann-recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(args.sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < args.n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = emb.filter(F.col("vec_id") >= args.n_queries).localCheckpoint(eager=True)
    n_corpus = corpus.count()
    dim = len(corpus.select("embedding").first()[0])

    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(corpus, queries, k=args.k).collect()
    }

    workdir = tempfile.mkdtemp(prefix="ann_recall_")

    def recall(index_dir: str, **serve) -> float:
        got = {
            (r["query_id"], r["vec_id"])
            for r in ann_query_index(
                spark, index_dir, queries, k=args.k, **serve
            ).collect()
        }
        return round(len(got & exact) / len(exact), 3)

    hp_dir = os.path.join(workdir, "hp")
    bootstrap_ann_index(corpus, hp_dir, dim=dim, n_planes=n_planes)

    centroids, _ = kmeans_fit(
        corpus.select("vec_id", "embedding"),
        "embedding",
        "vec_id",
        k=args.cells,
        iters=args.kmeans_iters,
    )
    ivf_dir = os.path.join(workdir, "ivf")
    bootstrap_ann_index(corpus, ivf_dir, dim=dim, centroids=centroids)

    out = {
        "sf_dir": args.sf_dir,
        "corpus_vecs": n_corpus,
        "queries": args.n_queries,
        "k": args.k,
        "cells": args.cells,
        "n_planes": n_planes,
        "kmeans_iters": args.kmeans_iters,
        # matched single-probe budgets: ~n/2**b vs ~n/cells candidates
        "recall_hyperplane_mp0": recall(hp_dir, multiprobe=0),
        "recall_ivf_nprobe1": recall(ivf_dir, nprobe=1),
        # each kind's recall knob, one step
        "recall_hyperplane_mp1": recall(hp_dir, multiprobe=1),
        "recall_ivf_nprobe2": recall(ivf_dir, nprobe=2),
        "recall_ivf_nprobe4": recall(ivf_dir, nprobe=4),
    }
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
