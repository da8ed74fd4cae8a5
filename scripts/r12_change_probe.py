"""Same-JVM interleaved adjudication of the four plan-shape changes
round 12 shipped unmeasured (round-12 VERDICT item 1), plus the
round-13 proposals — the window-bias-free complement to
scripts/bench_abab.py: cross-process ABAB showed a broad ~1.1-1.3x
inflation on UNTOUCHED queries between the two trees (host drift
aligned with run phase), so per-change attribution needs variants
interleaved inside ONE session, where the host window is shared and
the JIT/page-cache state is common.

Variants are applied by monkeypatching the module attribute the call
sites resolve at plan-build time (`operators.components.
connected_components`, `plans.crossmodal_queries.seeded_corpus`) or by
identity-patching `DataFrame.localCheckpoint` for the two partsupp
queries whose ONLY r11->r12 delta is that call. Each variant's
implementation is a verbatim copy of the corresponding tree's code.

Run: python scripts/r12_change_probe.py [--rounds 3]
Prints one JSON line per experiment: {query: {variant: best_sec}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from webscrap_datapipeline_spark.operators import components as C  # noqa: E402
from webscrap_datapipeline_spark.plans import REGISTRY  # noqa: E402
from webscrap_datapipeline_spark.plans import crossmodal_queries as XM  # noqa: E402
from webscrap_datapipeline_spark.session import get_spark  # noqa: E402


# --------------------------------------------------------------- CC variants
def cc_v11(edges, src, dst, max_iters=20, sym_materializer=None):
    """r11 shape: union-sym, eager checkpoints, distinct-init."""
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    sym = sym_materializer(sym) if sym_materializer else sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        nbr_min = (
            sym.join(labels, sym["u"] == labels["vertex"])
            .groupBy(F.col("v").alias("vertex2"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, labels["vertex"] == nbr_min["vertex2"], "left")
            .select(
                "vertex",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", "component")
                ).alias("component"),
                (F.col("nbr_component") < F.col("component")).alias("__changed"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = new_labels.filter(F.col("__changed")).count()
        labels = new_labels.drop("__changed")
        if n_changed == 0:
            break
    return labels


def cc_v12(edges, src, dst, max_iters=20, sym_materializer=None):
    """r12 shape: union-sym, coalesce-then-lazy-checkpoint, fused init."""
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    if sym_materializer is None:
        sym = sym.coalesce(edges.sparkSession.sparkContext.defaultParallelism)
        sym = sym.localCheckpoint(eager=False)
    else:
        sym = sym_materializer(sym)
    labels = (
        sym.groupBy(F.col("u").alias("vertex"))
        .agg(F.min("v").alias("__mn"))
        .select("vertex", F.least(F.col("vertex"), F.col("__mn")).alias("component"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iters):
        nbr_min = (
            sym.join(labels, sym["u"] == labels["vertex"])
            .groupBy(F.col("v").alias("vertex2"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, labels["vertex"] == nbr_min["vertex2"], "left")
            .select(
                "vertex",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", "component")
                ).alias("component"),
                (F.col("nbr_component") < F.col("component")).alias("__changed"),
            )
            .localCheckpoint(eager=False)
        )
        n_changed = new_labels.filter(F.col("__changed")).count()
        labels = new_labels.drop("__changed")
        if n_changed == 0:
            break
    return labels


# r13 proposal = the checked-out components.connected_components
cc_v13 = C.connected_components


# --------------------------------------------------- seeded_corpus variants
_seeded_v12 = XM.seeded_corpus


def seeded_no_coalesce(spark, sf_dir):
    """r11 shape of seeded_corpus: no coalesce before the checkpoint."""
    from webscrap_datapipeline_spark.catalog import ensure_min_parallelism, load_table

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "lang", "text")
    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    base = ensure_min_parallelism(
        docs.join(emb, docs["doc_id"] == emb["vec_id"]).select(
            "doc_id", "lang", "text", "embedding"
        ),
        spark,
    )
    text_copies = base.filter(F.col("doc_id") % 15 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "lang",
        "text",
        F.transform("embedding", lambda x: -x).alias("embedding"),
    )
    vec_copies = base.filter(F.col("doc_id") % 12 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        "lang",
        F.concat(F.lit("rewrite "), F.col("doc_id").cast("string")).alias("text"),
        "embedding",
    )
    return (
        base.unionByName(text_copies)
        .unionByName(vec_copies)
        .localCheckpoint(eager=False)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    spark = get_spark(app_name="r12-change-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def timed(name):
        q = REGISTRY[name]
        t0 = time.perf_counter()
        q.fn(spark, args.sf).count()
        return time.perf_counter() - t0

    results: dict[str, dict[str, dict[str, float]]] = {}

    # ---- experiment 1: CC shape (v11 / v12 / v13) --------------------
    cc_queries = ["dedup_cluster_sizes", "corpus_curation_stats"]
    exp1 = {q: {"v11": 1e9, "v12": 1e9, "v13": 1e9} for q in cc_queries}
    for _ in range(args.rounds):
        for tag, impl in (("v11", cc_v11), ("v12", cc_v12), ("v13", cc_v13)):
            C.connected_components = impl
            for q in cc_queries:
                exp1[q][tag] = min(exp1[q][tag], timed(q))
    C.connected_components = cc_v13
    results["cc_shape"] = exp1

    # ---- experiment 2: seeded_corpus coalesce (with r13 CC in place) --
    xm_queries = ["cross_modal_curation_stats"]
    exp2 = {q: {"coalesce": 1e9, "plain": 1e9} for q in xm_queries}
    for _ in range(args.rounds):
        for tag, impl in (("coalesce", _seeded_v12), ("plain", seeded_no_coalesce)):
            XM.seeded_corpus = impl
            for q in xm_queries:
                exp2[q][tag] = min(exp2[q][tag], timed(q))
    XM.seeded_corpus = _seeded_v12
    results["seeded_coalesce"] = exp2

    # ---- experiment 3: partsupp two-consumer localCheckpoint ----------
    ps_queries = ["important_stock_parts", "min_cost_region_suppliers"]
    exp3 = {q: {"ckpt": 1e9, "none": 1e9} for q in ps_queries}
    real_ckpt = DataFrame.localCheckpoint
    for _ in range(args.rounds):
        for tag in ("ckpt", "none"):
            DataFrame.localCheckpoint = (
                real_ckpt if tag == "ckpt" else (lambda self, eager=True: self)
            )
            try:
                for q in ps_queries:
                    exp3[q][tag] = min(exp3[q][tag], timed(q))
            finally:
                DataFrame.localCheckpoint = real_ckpt
    results["partsupp_ckpt"] = exp3

    for k, v in results.items():
        print(json.dumps({k: {q: {t: round(s, 3) for t, s in d.items()} for q, d in v.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
