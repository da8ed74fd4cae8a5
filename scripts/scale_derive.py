"""Derive a 4×-larger corpus from an existing scale_spot corpus — the
step that extends the growth curve past what a from-source build can
reach cheaply (a from-source ×4096 build is a 4096-branch union whose
ANALYSIS cost alone is prohibitive; deriving ×4096 from the cached
×1024 is a 4-branch plan over its parquet).

Same linearity guarantees as scripts/scale_spot.py, applied at the
GROUP level (the source corpus rides along verbatim as group 0):

* documents: groups 1–3 suffix EVERY token with ``_g{g}`` — group
  shingle sets are disjoint from group 0's (whose tokens never carry a
  ``_g`` suffix) and from each other, so posting lists never span
  groups and true near-dup workload grows exactly linearly. This is
  checkable: Σ c(c−1)/2 over capped posting lists must be exactly 4×
  the source corpus's count (see --count-volume).
* embeddings: groups 1–3 apply a deterministic per-group sign pattern
  (x_i ← s_{g,i}·x_i, s ∈ {±1} from xxhash64) — within-group distances
  are preserved bit-exactly (the same pattern on both sides of a dot
  product cancels), cross-group pairs decorrelate in expectation.
* events/ids: per-group 1e12 offsets — collision-free above any
  per-copy offset the source corpus used.

Run:
    python scripts/scale_derive.py --src /tmp/scale_spot/x1024 \
        --out /tmp/scale_spot/x4096
    python scripts/scale_derive.py --count-volume /tmp/scale_spot/x4096
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

_GROUP_OFF = 1_000_000_000_000  # above any per-copy offset in the source


def _read_sentinel(corpus: str) -> dict | None:
    """Parsed sentinel payload, or None for a missing/legacy-empty one."""
    path = os.path.join(corpus, "_CORPUS_COMPLETE")
    if not os.path.isfile(path):
        return None
    try:
        with open(path) as fh:
            raw = fh.read().strip()
        return json.loads(raw) if raw else None
    except ValueError:
        return None


def derive4x(spark: SparkSession, src: str, out: str) -> None:
    # Provenance guards (round-6 review): (1) a source without a
    # sentinel may be a truncated build — deriving from it would
    # launder incomplete data into a stamped-complete corpus; (2) an
    # already-DERIVED source breaks both invariants on a second hop
    # (src group 0's `foo`→`foo_g1` collides with src group 1's
    # `foo_g1`, and +1e12 offsets collide with the ids group 1 already
    # carries) — the output would look fine but its posting lists
    # would span groups and the volume 'linearity' would be garbage.
    src_stamp = _read_sentinel(src)
    if not os.path.isfile(os.path.join(src, "_CORPUS_COMPLETE")):
        raise SystemExit(
            f"{src} has no _CORPUS_COMPLETE sentinel — refusing to derive from "
            f"a possibly-truncated build"
        )
    if src_stamp and src_stamp.get("builder") == "scale_derive":
        raise SystemExit(
            f"{src} is itself a derived corpus ({src_stamp!r}): a second "
            f"derivation hop collides group suffixes (_g1 + _g1) and id "
            f"offsets — derive each factor from a scale_spot-built source"
        )
    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    ev = spark.read.parquet(os.path.join(src, "events.parquet"))
    d_parts, e_parts, v_parts = [docs], [emb], [ev]
    for g in range(1, 4):
        off = g * _GROUP_OFF
        remapped = F.array_join(
            F.transform(F.split("text", " "), lambda w: F.concat(w, F.lit(f"_g{g}"))),
            " ",
        )
        d_parts.append(
            docs.select(
                (F.col("doc_id") + off).alias("doc_id"),
                remapped.alias("text"),
                "lang",
                "source",
                F.length(remapped).alias("n_chars"),
            )
        )
        signed = F.transform(
            "embedding",
            lambda x, i: x
            * F.when(
                F.pmod(F.xxhash64(F.lit(f"derived_g{g}"), i), F.lit(2)) == 0,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0)),
        )
        e_parts.append(
            emb.select(
                (F.col("vec_id") + off).alias("vec_id"),
                signed.alias("embedding"),
                "label",
            )
        )
        v_parts.append(
            ev.select(
                (F.col("event_id") + off).alias("event_id"),
                "ts",
                (F.col("user_id") + off).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )

    from scripts.scale_spot import union_all  # shared, not duplicated

    os.makedirs(out, exist_ok=True)
    union_all(d_parts).write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    union_all(e_parts).write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    union_all(v_parts).write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))
    with open(os.path.join(out, "_CORPUS_COMPLETE"), "w") as fh:
        json.dump(
            {
                "builder": "scale_derive",
                "src": src,
                "src_sentinel": src_stamp,  # full provenance chain
                "factor": "4x source",
            },
            fh,
        )


def count_volume(spark: SparkSession, corpus: str, cap: int | None = None) -> dict:
    """Exact near-dup candidate volume: Σ c(c−1)/2 over capped posting
    lists, via the SAME (doc, shingle-hash) frame and cap constant
    operators/dedup.jaccard_pairs shuffles on — IMPORTED from there
    (round-6 review: a reimplementation that drifted from dedup's
    hashing or cap would silently count a different workload and make
    the SCALE.md linearity tables unfalsifiable). Volumes are exact
    and host-window-independent — the GC-immune way to prove
    linearity (SCALE.md ×1024 methodology)."""
    if not os.path.isfile(os.path.join(corpus, "_CORPUS_COMPLETE")):
        # Same refusal as derive4x (round-6 ADVICE): a truncated or
        # interrupted build would yield a silently-wrong pair count,
        # poisoning the very linearity table this counter exists to prove.
        raise SystemExit(
            f"{corpus} has no _CORPUS_COMPLETE sentinel — refusing to count "
            "candidate volume on a possibly-truncated corpus."
        )
    from webscrap_datapipeline_spark.operators.dedup import (
        DEFAULT_SHINGLE_FREQ_CAP,
        shingle_hash_sets,
    )

    cap = DEFAULT_SHINGLE_FREQ_CAP if cap is None else cap
    docs = spark.read.parquet(os.path.join(corpus, "documents.parquet"))
    sh = shingle_hash_sets(docs, "text", "doc_id", n=3).select(
        "doc", F.explode("sh").alias("h")
    )
    hist = sh.groupBy("h").agg(F.count(F.lit(1)).alias("c")).filter(F.col("c") >= 2)
    row = (
        hist.select(
            F.sum(F.when(F.col("c") <= cap, F.col("c") * (F.col("c") - 1) / 2).otherwise(0))
            .cast("bigint")
            .alias("pairs"),
            F.max("c").alias("max_freq"),
            F.sum(F.when(F.col("c") > cap, 1).otherwise(0)).alias("capped_out_lists"),
        )
        .collect()[0]
    )
    return {
        "corpus": corpus,
        "candidate_pairs": row["pairs"],
        "max_shingle_freq": row["max_freq"],
        "capped_out_lists": row["capped_out_lists"],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/tmp/scale_spot/x1024")
    ap.add_argument("--out", default="/tmp/scale_spot/x4096")
    ap.add_argument(
        "--count-volume",
        metavar="CORPUS",
        default=None,
        help="skip building; print the exact candidate-pair volume for CORPUS",
    )
    args = ap.parse_args()

    from webscrap_datapipeline_spark.session import get_spark

    spark = get_spark(app_name="scale-derive")
    spark.sparkContext.setLogLevel("ERROR")
    if args.count_volume:
        print(json.dumps(count_volume(spark, args.count_volume)), flush=True)
    else:
        derive4x(spark, args.src, args.out)
        print(json.dumps({"derived": args.out, "src": args.src}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
