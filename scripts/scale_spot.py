"""Scale spot-run: do the dedup/ANN pipelines grow sub-quadratically?

Builds synthetic ×1 / ×4 / ×16 up-scales of the sf0.1 corpus and times
the three pipelines VERDICT.md (round 2, task 7) asked to see an order
of magnitude up: ``near_dup_jaccard_topk``, ``dedup_cluster_sizes``,
``embedding_ann_lsh_topk``. Results land in SCALE.md.

Up-scaling is replication WITHOUT creating cross-copy duplicates — the
failure mode of naive replication is that every copy of a document is a
near-dup of every other copy, so the TRUE pair count grows
quadratically in the factor and the measurement can't distinguish
algorithmic blow-up from genuine output growth. Instead:

* documents: copy k suffixes every token with ``_k`` — shingle sets
  across copies are disjoint, so each copy reproduces the sf0.1 dup
  structure internally and the true workload grows linearly;
* embeddings: copy k rotates the vector by k positions — decorrelates
  LSH buckets across copies (identical copies would stack 16 identical
  vectors per bucket).

Run:  python scripts/scale_spot.py [--factors 1,4,16] [--out /tmp/scale_spot]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from webscrap_datapipeline_spark.catalog import load_table  # noqa: E402
from webscrap_datapipeline_spark.plans import REGISTRY  # noqa: E402

SRC_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_TABLES = ["documents", "embeddings", "events"]
# Construction revision of build_corpus. Bump whenever the replication
# ALGORITHM changes (not just refactors): a kept corpus built by an older
# algorithm would otherwise payload-match the stamp and silently mix two
# constructions into one growth curve (round-6 ADVICE). History:
#   1 — position-rotation embeddings only (exhausts at k == dim).
#   2 — k>=64 copies add the xxhash64 sign-pattern decorrelation
#       (scale_spot build_corpus, commit a0f6b14).
BUILD_REV = 2
QUERIES = tuple(
    os.environ.get(
        "SPARK_GRAFT_SCALE_QUERIES",
        "near_dup_jaccard_topk,dedup_cluster_sizes,embedding_ann_lsh_topk",
    ).split(",")
)


def union_all(parts: list[DataFrame]) -> DataFrame:
    """Fold unionByName over replica parts — shared with
    scripts/scale_derive.py so both corpus builders stay in lockstep."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def build_corpus(spark: SparkSession, factor: int, out_dir: str) -> None:
    docs = load_table(spark, "documents", SRC_SF)
    emb = load_table(spark, "embeddings", SRC_SF)
    events = load_table(spark, "events", SRC_SF)

    doc_parts = []
    emb_parts = []
    ev_parts = []
    for k in range(factor):
        if k == 0:
            doc_parts.append(docs)
            emb_parts.append(emb)
            ev_parts.append(events)
            continue
        off = k * 10_000_000
        remapped = F.array_join(
            F.transform(F.split("text", " "), lambda w: F.concat(w, F.lit(f"_{k}"))),
            " ",
        )
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + off).alias("doc_id"),
                remapped.alias("text"),
                "lang",
                "source",
                F.length(remapped).alias("n_chars"),
            )
        )
        rot = k % 64
        rotated = F.concat(
            F.slice("embedding", rot + 1, 64 - rot), F.slice("embedding", 1, rot)
        )
        if k >= 64:
            # Rotation classes repeat every dim=64 copies: copy k and
            # k+64 would be IDENTICAL vectors, so past ×64 the TRUE
            # near-dup workload grows quadratically by construction
            # (measured: ×142 LSH pair rows at ×256, round 6) and the
            # measurement can no longer separate engine cost from
            # output growth. A deterministic per-copy-group sign
            # pattern restores the linearity guarantee: the SAME
            # pattern on both sides of a dot product cancels
            # (Σ sᵢ² xᵢ yᵢ = x·y), so every within-copy distance — the
            # sf0.1 dup structure — is preserved bit-exactly, while
            # cross-group pairs decorrelate (E[Σ sᵢ s'ᵢ xᵢ²] = 0).
            g = k // 64
            rotated = F.transform(
                rotated,
                lambda x, i: x
                * F.when(
                    F.pmod(F.xxhash64(F.lit(g), i), F.lit(2)) == 0, F.lit(1.0)
                ).otherwise(F.lit(-1.0)),
            )
        emb_parts.append(
            emb.select(
                (F.col("vec_id") + off).alias("vec_id"),
                rotated.alias("embedding"),
                "label",
            )
        )
        # events: each copy is an independent user population (shifted
        # user_id/event_id) with the original per-user time structure —
        # per-key windows, funnels, and cohorts grow linearly
        ev_parts.append(
            events.select(
                (F.col("event_id") + off).alias("event_id"),
                "ts",
                (F.col("user_id") + off).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )

    os.makedirs(out_dir, exist_ok=True)
    union_all(doc_parts).write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))
    union_all(emb_parts).write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))
    union_all(ev_parts).write.mode("overwrite").parquet(os.path.join(out_dir, "events.parquet"))


def corpus_reuse_decision(
    corpus_dir: str, stamp: dict
) -> tuple[bool, str]:
    """(reuse, reason) for a possibly-kept corpus dir. The sentinel
    payload records WHAT the corpus was built from — reusing a kept
    x-dir built from a different SPARK_GRAFT_SF_DIR would mix two
    source corpora into one growth curve with no warning (round-6
    review) — and WHICH algorithm revision built it (the ``rev`` token;
    round-6 ADVICE). Any mismatch — including a legacy empty sentinel,
    which cannot attest a revision — rebuilds. Unit-tested without
    Spark in tests/test_scripts.py."""
    sentinel = os.path.join(corpus_dir, "_CORPUS_COMPLETE")
    if not os.path.isfile(sentinel):
        return False, "no sentinel"
    try:
        with open(sentinel) as fh:
            raw = fh.read().strip()
        found = json.loads(raw) if raw else None
    except ValueError:
        found = None
    if found == stamp:
        return True, "payload match"
    # No legacy-adoption path: an empty (pre-payload) sentinel cannot
    # attest WHICH construction revision built the corpus, and adopting
    # it would stamp the current rev onto possibly-older embeddings —
    # the exact mixing hazard the rev token exists to prevent (round-6
    # ADVICE). A genuinely-current legacy corpus can be re-stamped by
    # hand after out-of-band verification (mtime vs the rev commit).
    return False, f"sentinel payload {found!r} does not match this run ({stamp!r})"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,4,16")
    ap.add_argument("--out", default="/tmp/scale_spot")
    ap.add_argument(
        "--keep",
        action="store_true",
        help="keep corpora; a kept corpus (sentinel-stamped) is reused on "
        "the next run — lets A/B conf runs share one ×256 build",
    )
    args = ap.parse_args()
    factors = [int(x) for x in args.factors.split(",")]

    from webscrap_datapipeline_spark.session import get_spark

    spark = get_spark(app_name="scale-spot")
    results = []
    for factor in factors:
        corpus_dir = os.path.join(args.out, f"x{factor}")
        sentinel = os.path.join(corpus_dir, "_CORPUS_COMPLETE")
        stamp = {
            "builder": "scale_spot",
            "rev": BUILD_REV,
            "src_sf": SRC_SF,
            "tables": _TABLES,
        }
        reuse, reason = corpus_reuse_decision(corpus_dir, stamp)
        if not reuse and reason != "no sentinel":
            print(f"rebuilding {corpus_dir}: {reason}", flush=True)
        if not reuse:
            shutil.rmtree(corpus_dir, ignore_errors=True)
            build_corpus(spark, factor, corpus_dir)
            with open(sentinel, "w") as fh:
                json.dump(stamp, fh)
        for name in QUERIES:
            fn = REGISTRY[name].fn
            if factor == factors[0]:
                # discarded warm-up at the first factor: the first
                # execution pays JVM/codegen/first-scan costs that would
                # otherwise inflate the ×1 baseline and bias every
                # growth ratio optimistically (round-3 ADVICE).
                fn(spark, corpus_dir).count()
            t0 = time.monotonic()
            df = fn(spark, corpus_dir)
            n = df.count()
            sec = round(time.monotonic() - t0, 3)
            results.append({"query": name, "factor": factor, "rows": n, "sec": sec})
            print(json.dumps(results[-1]), flush=True)
    spark.stop()
    if not args.keep:
        shutil.rmtree(args.out, ignore_errors=True)

    by_q: dict[str, dict[int, float]] = {}
    for r in results:
        by_q.setdefault(r["query"], {})[r["factor"]] = r["sec"]
    print("== growth ratios (time ratio / data ratio; <1 ⇒ sub-linear cost growth)")
    for q, ts in by_q.items():
        fs = sorted(ts)
        for a, b in zip(fs, fs[1:]):
            print(f"{q}: x{a}->x{b}: time x{ts[b]/ts[a]:.2f} vs data x{b/a}")


if __name__ == "__main__":
    main()
