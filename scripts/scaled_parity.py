"""Registry-wide oracle parity at REPLICATED scale — closes the last
evidence gap from VERDICT.md round 3 ("What's missing" #4: oracle
parity proven only up to sf0.1).

The driver's correctness gate runs at sf0.01 and the local pytest twin
at sf0.001/sf0.1; no shipped corpus is larger. But nothing about the
comparison itself is scale-bound: DuckDB reads the same parquet Spark
does, so a synthetically up-scaled corpus lets the faithful comparator
(tests/oracle_compare.py — the driver's pandas/dtype-sensitive twin)
check EVERY oracled query at sf0.4/sf1.6-equivalent volume. This is
the sweep that would expose residual float-accumulation-order traps,
sampler/boundary nondeterminism, or total-order violations that only
manifest once partitions stop seeing the whole table (exactly how the
round-3 ``assign_contiguous_ids`` bug and the round-3-ADVICE
``late_arrival_audit`` id-collision hazard behave: invisible at small
SF, silent flakes at scale).

Corpus construction (factor k):
  * documents / embeddings / events — scripts/scale_spot.build_corpus
    (token-remapped / vector-rotated / user-shifted copies: the dup
    structure and per-key time structure grow linearly, never
    quadratically);
  * orders / lineitem — k copies with o_orderkey / l_orderkey shifted
    by k·10⁷ (PK uniqueness) and ALL dimension FKs (custkey, partkey,
    suppkey) left intact, so every join still resolves and per-dim
    aggregates simply grow k-fold;
  * region / nation / customer / supplier / part — copied as-is
    (dimensions; replicating them would break FK uniqueness).

Run:  python scripts/scaled_parity.py [--factor 16] [--out /tmp/scaled_parity]
      [--queries name1,name2]   # default: every registered query
Prints one line per query (ok/fail + Spark/DuckDB seconds) and a
summary; exit code 1 on any mismatch.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scripts.scale_spot import SRC_SF, build_corpus  # noqa: E402
from webscrap_datapipeline_spark.catalog import load_table  # noqa: E402
from webscrap_datapipeline_spark.plans import REGISTRY  # noqa: E402

DIM_TABLES = ("region", "nation", "customer", "supplier", "part")


def build_tpch(spark, factor: int, out_dir: str) -> None:
    """Replicate the relational half of the corpus (see module doc)."""
    for t in DIM_TABLES:
        load_table(spark, t, SRC_SF).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet")
        )
    orders = load_table(spark, "orders", SRC_SF)
    lineitem = load_table(spark, "lineitem", SRC_SF)
    o_parts, l_parts = [], []
    for k in range(factor):
        off = k * 10_000_000
        o_parts.append(orders.withColumn("o_orderkey", F.col("o_orderkey") + off))
        l_parts.append(lineitem.withColumn("l_orderkey", F.col("l_orderkey") + off))
    out_o, out_l = o_parts[0], l_parts[0]
    for p in o_parts[1:]:
        out_o = out_o.unionByName(p)
    for p in l_parts[1:]:
        out_l = out_l.unionByName(p)
    out_o.write.mode("overwrite").parquet(os.path.join(out_dir, "orders.parquet"))
    out_l.write.mode("overwrite").parquet(os.path.join(out_dir, "lineitem.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=16)
    ap.add_argument("--out", default="/tmp/scaled_parity")
    ap.add_argument("--queries", default="")
    ap.add_argument("--keep", action="store_true", help="keep the corpus dir")
    ap.add_argument(
        "--compare", choices=("faithful", "hashed"), default="faithful",
        help="'faithful' = the driver's pandas sort-and-compare twin; "
        "'hashed' = chunked multiset-md5 digest with the same per-cell "
        "canonicalization (tests/oracle_compare.compare_hashed) — same "
        "verdicts, no O(n log n) comparator sorts and no full oracle "
        "materialization, for large --factor sweeps whose wall was "
        "comparator-dominated (round-11 VERDICT item 7)",
    )
    args = ap.parse_args()

    from tests.oracle_compare import compare, compare_hashed, duckdb_con
    from webscrap_datapipeline_spark.session import get_spark

    spark = get_spark(app_name="scaled-parity")
    spark.sparkContext.setLogLevel("ERROR")
    # Build into a temp dir and rename atomically on success, gated by a
    # sentinel file (round-4 ADVICE: an interrupted build must not be
    # silently reused as a complete corpus, and cleanup must only touch
    # directories THIS run created — never a pre-existing --keep corpus).
    corpus = os.path.join(args.out, f"x{args.factor}")
    sentinel = os.path.join(corpus, "_CORPUS_COMPLETE")
    created_corpus = False
    if os.path.isfile(sentinel):
        # scripts/scale_spot.py stamps the same sentinel NAME on its
        # 3-table corpora — a kept scale_spot tree pointed at --out here
        # would short-circuit the build and then fail on every missing
        # relational table (round-6 review). A stamped corpus must still
        # BE a ten-table corpus; refuse (don't silently delete a foreign
        # build that may have taken hours) when it isn't.
        expected = DIM_TABLES + ("orders", "lineitem", "documents", "embeddings", "events")
        missing = [
            t
            for t in expected
            if not glob.glob(os.path.join(corpus, f"{t}.parquet", "*.parquet"))
        ]
        if missing:
            raise SystemExit(
                f"{corpus} carries a _CORPUS_COMPLETE sentinel but lacks tables "
                f"{missing} — a different builder's corpus (scale_spot?). Point "
                f"--out elsewhere or remove that directory yourself."
            )
    if os.path.isdir(corpus) and not os.path.isfile(sentinel):
        # A corpus built by a PRE-sentinel version of this script and
        # kept with --keep has every table but no sentinel — deleting it
        # here is exactly the behavior the sentinel was added to prevent
        # (round-5 ADVICE). "Every dir has >=1 part" is NOT completeness:
        # an interrupted pre-tmp-rename in-place build can leave all ten
        # dirs holding a committed SUBSET of parts (round-6 ADVICE).
        # Spark's job committer writes the per-table _SUCCESS marker only
        # after ALL of that table's parts are committed, so adoption now
        # requires _SUCCESS in every table dir; anything less really is
        # an interrupted build.
        expected = DIM_TABLES + ("orders", "lineitem", "documents", "embeddings", "events")
        if all(
            os.path.isfile(os.path.join(corpus, f"{t}.parquet", "_SUCCESS"))
            and glob.glob(os.path.join(corpus, f"{t}.parquet", "*.parquet"))
            for t in expected
        ):
            print(f"adopting legacy sentinel-less corpus at {corpus}", flush=True)
            with open(sentinel, "w"):
                pass
        else:
            print(f"discarding INCOMPLETE corpus at {corpus} (no sentinel)", flush=True)
    if not os.path.isfile(sentinel):
        if os.path.isdir(corpus):  # leftover from an interrupted build
            shutil.rmtree(corpus)
        tmp = corpus + ".building"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        build_corpus(spark, args.factor, tmp)
        build_tpch(spark, args.factor, tmp)
        with open(os.path.join(tmp, "_CORPUS_COMPLETE"), "w"):
            pass
        os.rename(tmp, corpus)
        created_corpus = True
    con = duckdb_con(corpus)

    names = (
        [n for n in args.queries.split(",") if n]
        if args.queries
        else list(REGISTRY)
    )
    fails, results = [], []
    for name in names:
        q = REGISTRY[name]
        t0 = time.monotonic()
        df = q.fn(spark, corpus)
        if q.oracle is None:
            n = df.count()
            results.append({"query": name, "rows_only": n, "sec": round(time.monotonic() - t0, 2)})
            print(json.dumps(results[-1]), flush=True)
            continue
        cmp_fn = compare_hashed if args.compare == "hashed" else compare
        res = cmp_fn(df, con, q.oracle)
        t_spark = round(time.monotonic() - t0, 2)
        row = {"query": name, "ok": res["ok"], "sec": t_spark,
               "rows": res.get("spark_rows")}
        if not res["ok"]:
            row["err"] = str(res.get("err", ""))[:200]
            row["first_diffs"] = str(res.get("first_diffs", ""))[:400]
            fails.append(name)
        results.append(row)
        print(json.dumps(row), flush=True)
    spark.stop()
    if not args.keep and created_corpus:
        shutil.rmtree(corpus, ignore_errors=True)
    n_oracled = sum(1 for r in results if "ok" in r)
    print(f"== scaled parity x{args.factor} [{args.compare}]: "
          f"{n_oracled - len(fails)}/{n_oracled} "
          f"oracled green, {len(results) - n_oracled} rows-only ran; FAILS={fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
