"""Interleaved same-window A/B bench adjudication — one command for the
control the round-9 bench dispute needed (round-9 VERDICT item 5).

Cross-session bench numbers on this host move ×1.4-1.5 with ambient
load (CPU steal, page cache), so "this round is 25% slower than last
round's committed record" is NOT evidence of a regression. The control
that separates conditions from code is interleaving the two TREES in
the SAME window: A B A B ..., then comparing per-query best-of times
tree-vs-tree. A genuine plan regression shows up as a per-query ratio
shift that survives the interleave; a window shift inflates both trees
equally and the common-set median ratio stays ~1.0.

Usage (the round-N adjudication):
  python scripts/bench_abab.py --ref-b <prev-round-bench-commit>
  # A defaults to WORKING (the checked-out tree, uncommitted edits
  # included); B is materialized read-only via `git worktree add`.

Prints ONE JSON line on stdout:
  {"a": ..., "b": ..., "runs": N, "median_ratio": ..., "p90_ratio": ...,
   "over_2x": [...], "common_queries": M,
   "total_a": best-of total, "total_b": ...,
   "per_query": {name: {"a": s, "b": s, "ratio": a/b}}}
ratio is a/b (A slower than B ⇒ > 1). Gate: BASELINE.md §B's ≤2×
round-over-round applies to these same-window ratios, not to
cross-window totals.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(tree_dir: str, sf_dir: str, timeout: int) -> dict:
    """One bench.py run in ``tree_dir``; returns the FULL per-query
    record from the tree's bench_full.json (the stdout line truncates
    to the slowest queries for the driver's tail capture — reading it
    would silently drop the fast majority from the common set)."""
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    p = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree_dir,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    full = os.path.join(tree_dir, "bench_full.json")
    if p.returncode != 0 or not os.path.exists(full):
        raise SystemExit(
            f"bench.py in {tree_dir} failed "
            f"(exit {p.returncode}):\n{p.stderr[-2000:]}"
        )
    with open(full) as f:
        return json.load(f)


def best_of(runs: list[dict]) -> dict[str, float]:
    """Per-query minimum across a tree's runs — the host-noise-robust
    statistic (a query can only be slowed by interference, never sped
    up past the code's floor)."""
    out: dict[str, float] = {}
    for r in runs:
        for q, s in r.get("queries", {}).items():
            out[q] = min(out.get(q, float("inf")), s)
    return out


def summarize(best_a: dict[str, float], best_b: dict[str, float]) -> dict:
    """Common-set per-query ratio table + the adjudication statistics
    (median / p90 / over-2× list) for two best-of maps."""
    common = sorted(set(best_a) & set(best_b))
    per_query = {
        q: {
            "a": round(best_a[q], 3),
            "b": round(best_b[q], 3),
            "ratio": round(best_a[q] / best_b[q], 3) if best_b[q] > 0 else None,
        }
        for q in common
    }
    ratios = sorted(v["ratio"] for v in per_query.values() if v["ratio"] is not None)
    return {
        "common_queries": len(common),
        "only_a": sorted(set(best_a) - set(best_b)),
        "only_b": sorted(set(best_b) - set(best_a)),
        "median_ratio": round(statistics.median(ratios), 3) if ratios else None,
        "p90_ratio": round(ratios[int(0.9 * (len(ratios) - 1))], 3) if ratios else None,
        "over_2x": sorted(q for q, v in per_query.items() if v["ratio"] and v["ratio"] > 2),
        "total_a": round(sum(best_a[q] for q in common), 2),
        "total_b": round(sum(best_b[q] for q in common), 2),
        "per_query": per_query,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--ref-a",
        default="WORKING",
        help="tree A: a git ref, or WORKING for the live checkout "
        "(default — uncommitted edits included)",
    )
    ap.add_argument("--ref-b", required=True, help="tree B: a git ref (e.g. the previous round's bench commit)")
    ap.add_argument("--runs", type=int, default=2, help="A/B pairs to interleave (best-of per tree)")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--timeout", type=int, default=900, help="per-run timeout seconds")
    args = ap.parse_args()

    def materialize(ref: str) -> tuple[str, str | None]:
        if ref == "WORKING":
            return REPO, None
        d = tempfile.mkdtemp(prefix=f"abab_{ref[:12].replace('/', '_')}_")
        subprocess.run(
            ["git", "worktree", "add", "--detach", "--force", d, ref],
            cwd=REPO,
            check=True,
            capture_output=True,
        )
        return d, d

    dir_a, wt_a = materialize(args.ref_a)
    dir_b, wt_b = materialize(args.ref_b)
    runs_a: list[dict] = []
    runs_b: list[dict] = []
    try:
        for i in range(args.runs):
            print(f"[abab] pair {i + 1}/{args.runs}: A ({args.ref_a})", file=sys.stderr, flush=True)
            runs_a.append(run_bench(dir_a, args.sf_dir, args.timeout))
            print(f"[abab] pair {i + 1}/{args.runs}: B ({args.ref_b})", file=sys.stderr, flush=True)
            runs_b.append(run_bench(dir_b, args.sf_dir, args.timeout))
    finally:
        for wt in (wt_a, wt_b):
            if wt:
                subprocess.run(
                    ["git", "worktree", "remove", "--force", wt],
                    cwd=REPO,
                    capture_output=True,
                )

    result = {
        "a": args.ref_a,
        "b": args.ref_b,
        "runs": args.runs,
        "sf_dir": args.sf_dir,
        **summarize(best_of(runs_a), best_of(runs_b)),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
