"""End-to-end incremental pipeline — the Spark re-expression of the
reference's main() (main.py:30-112, traced in SURVEY.md §3.1):

  available keys (source listing)            ─┐
  state (JSON watermark store)                ├→ detect_changes (anti-join)
  fetch changed keys (mapPartitions scaffold) ─┘        │
  enrich (one lazy plan over the raw scan)              │
  warehouse append + SCD current-flag                   │
  audit log append                                      │
  state commit (ONLY after loads succeed — ST2)  ←──────┘

Two actions total (warehouse write, log write) + one small state write;
everything between is one lazy DAG. The scrape result is cached before
use so Spark's recompute-on-failure can't re-fire side effects.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.change_detection import detect_changes, update_state
from .operators.enrich import enrich_reports
from .operators.log_table import build_log_table
from .operators.scd import apply_current_flag
from .sources.csv_reports import read_raw_reports
from .sources.state_store import commit_state, read_state
from .sources.validation import quarantine


@dataclass
class PipelineResult:
    changed_keys: int
    loaded_rows: int
    log_rows: int
    quarantined_rows: int = 0


def run_incremental(
    spark: SparkSession,
    available: DataFrame,  # columns: key, last_seen_ts (FIXTURES.md A4)
    raw_glob: str,
    state_path: str,
    warehouse_path: str,
    log_path: str,
    quarantine_rules: dict | None = None,
    quarantine_path: str | None = None,
) -> PipelineResult:
    """One incremental cycle. ``available`` is the already-fetched source
    listing (the scrape scaffold produces it in production; tests build it
    directly — the pipeline is pure downstream of it)."""
    state = read_state(spark, state_path)
    changed = detect_changes(available, state, "key", "last_seen_ts").cache()
    n_changed = changed.count()
    if n_changed == 0:
        return PipelineResult(0, 0, 0)  # early-exit (reference main.py:58-59)

    # Enrich every fetched raw file in one scan; restrict to changed keys
    # (semi-join — the reference restricts by only downloading changed files).
    raw = read_raw_reports(spark, raw_glob)
    enriched = enrich_reports(raw).join(
        F.broadcast(changed.select(F.col("key").alias("LOC_ID"))), "LOC_ID", "left_semi"
    )

    # Optional row quarantine (ST4 generalized): rule violations leave
    # the load path as DATA (reprocessable, with reasons) instead of
    # being swallowed like the reference's per-row try/except.
    n_quarantined = 0
    if quarantine_rules:
        enriched, bad = quarantine(enriched, quarantine_rules)
        if quarantine_path is not None:
            bad.write.mode("append").parquet(quarantine_path)
            n_quarantined = spark.read.parquet(quarantine_path).count()
        else:
            n_quarantined = bad.count()

    # Warehouse append with SCD current-flag maintenance (K5+K3).
    if os.path.exists(warehouse_path):
        existing = spark.read.parquet(warehouse_path)
        # ingest only files not already loaded (the reference relied on
        # emptying its raw dir each run, K6; lineage anti-join replaces
        # that filesystem lifecycle and is replay-safe)
        enriched = enriched.join(
            existing.select("LOC_ID", "SRC_FILENAME").distinct(),
            ["LOC_ID", "SRC_FILENAME"],
            "left_anti",
        )
        merged = apply_current_flag(
            existing, enriched, key="LOC_ID", ts="LST_UPDT_TS", tiebreak="SRC_FILENAME"
        )
    else:
        merged = apply_current_flag(
            enriched.limit(0), enriched, key="LOC_ID", ts="LST_UPDT_TS", tiebreak="SRC_FILENAME"
        )
    tmp = warehouse_path + ".staging"
    merged.write.mode("overwrite").parquet(tmp)
    _swap(warehouse_path, tmp)
    loaded = spark.read.parquet(warehouse_path).count()

    # Audit log (ST5): every changed key gets a row; keys whose file never
    # arrived get the NULL row (J4 left-outer semantics).
    log_df = build_log_table(
        changed.select(F.col("key").alias("LOC_ID")),
        spark.read.parquet(warehouse_path).filter(F.col("CURRENT_IND") == "Y"),
    )
    log_df.write.mode("append").parquet(log_path)
    n_log = log_df.count()

    # State commit LAST (ST2): only keys that made it into the warehouse
    # advance the watermark, so failures retry next cycle.
    loaded_keys = (
        spark.read.parquet(warehouse_path)
        .filter(F.col("CURRENT_IND") == "Y")
        .select(F.col("LOC_ID").alias("key"))
        .distinct()
    )
    updates = changed.join(loaded_keys, "key", "left_semi").select("key", "last_seen_ts")
    new_state = update_state(
        state.withColumnRenamed("last_seen_ts", "ts_state"),
        updates.withColumnRenamed("last_seen_ts", "ts_state"),
        key="key",
        ts="ts_state",
    ).withColumnRenamed("ts_state", "last_seen_ts")
    commit_state(new_state, state_path)

    changed.unpersist()
    return PipelineResult(n_changed, loaded, n_log, n_quarantined)


def _swap(path: str, staging: str) -> None:
    import shutil
    import uuid

    old = f"{path}.old-{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old, ignore_errors=True)
